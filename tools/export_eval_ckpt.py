#!/usr/bin/env python
"""Export an eval-grade copy of a checkpoint: EMA weights + config only.

Training checkpoints carry params + EMA + both Adam moments (~4x the model
size — 157M for the flagship ukbb192 HVAE), too heavy to version for every
milestone. Everything downstream of training (cli.evaluate, the DSCM merge in
cli.train_cf, examples/) reads ONLY ema_params / ema_trainable, so this tool
writes a stripped copy in the exact same orbax layout with the non-EMA trees
replaced by empty dicts ({} restores structurally and is never read on the
inference paths).

Usage:
  python tools/export_eval_ckpt.py SRC_CKPT DST_DIR [--kind vae|cf]
  # -> DST_DIR/checkpoint (+ .meta.json)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import orbax.checkpoint as ocp

    p = argparse.ArgumentParser()
    p.add_argument("src", help="checkpoint path (the orbax dir / symlink)")
    p.add_argument("dst", help="output dir; writes dst/checkpoint")
    p.add_argument("--kind", choices=["vae", "cf"], default="vae",
                   help="vae: TrainState payload (also PGM/predictor); "
                        "cf: CFTrainState payload")
    args = p.parse_args()

    src = os.path.abspath(args.src)
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(src)

    # preserve the payload's own key set (schemas differ slightly per state
    # type: the PGM TrainState has no ema_updates/skipped) — EMA trees kept,
    # every other tree emptied
    keep = {"ema_trainable", "ema_params", "step", "ema_updates", "skipped"}
    empty = {"trainable", "params", "opt_state", "lagrange_opt_state"}
    slim = {
        k: (payload[k] if k in keep else {})
        for k in payload
        if k in keep | empty
    }

    os.makedirs(args.dst, exist_ok=True)
    dst = os.path.join(os.path.abspath(args.dst), "checkpoint")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    ckptr.save(dst, slim)
    shutil.copy(src + ".meta.json", dst + ".meta.json")
    with open(dst + ".meta.json") as f:
        meta = json.load(f)
    meta.setdefault("extra", {})["eval_grade"] = True
    with open(dst + ".meta.json", "w") as f:
        json.dump(meta, f)
    print(json.dumps({"exported": dst, "kind": args.kind}))


if __name__ == "__main__":
    main()
