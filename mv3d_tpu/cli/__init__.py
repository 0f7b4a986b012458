"""Command-line entry points (parity with reference src/{train,test,tracking}.py).

Usage:
    python -m mv3d_tpu.cli.train -n tag -i 10000 -t top_view_rpn ...
    python -m mv3d_tpu.cli.tracking -n tag -w all ...
    python -m mv3d_tpu.cli.test -n tag test_rpn ...
    python -m mv3d_tpu.cli.preprocess --kitti-object /path ...
    python -m mv3d_tpu.cli.rehearsal --kitti-object /path ...   # raw files -> iou CSVs
    python -m mv3d_tpu.cli.export -n tag --out artifacts/ ...   # AOT artifact
    python -m mv3d_tpu.cli.serve --artifact artifacts/ ...      # HTTP endpoint
    python -m mv3d_tpu.cli.dashboard log/ ...                   # metrics -> HTML
    python -m mv3d_tpu.cli.render <drive_dir> ...               # gif/avi video
    python -m mv3d_tpu.cli.viewer <bin-or-npz> ...              # BEV/front pngs
"""
