"""Shared CLI plumbing: config selection and overrides.

Gives every entry point the reference's two override surfaces —
``cfg_from_file`` (yaml/json, reference src/config.py:258-264) and
``cfg_from_list`` (dotted key/value pairs, src/config.py:266-286) — on top of
the dataset presets, without mutating any global state.
"""

from __future__ import annotations

import argparse


def add_config_args(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--dataset", default="kitti",
                    choices=["kitti", "didi", "didi2"],
                    help="config preset (reference cfg.DATA_SETS_TYPE)")
    ap.add_argument("--config", default="",
                    help="yaml/json config override file (cfg_from_file)")
    ap.add_argument("--set", nargs=2, action="append", dest="set_kv",
                    metavar=("KEY", "VALUE"), default=[],
                    help="dotted config override, e.g. --set rpn.nms_thresh "
                         "0.5 (cfg_from_list)")


def resolve_config(args: argparse.Namespace):
    from ..config import config_from_file, config_from_list, make_config
    cfg = make_config(args.dataset)
    if args.config:
        cfg = config_from_file(cfg, args.config)
    for k, v in args.set_kv:
        cfg = config_from_list(cfg, [k, v])
    return cfg
