#!/usr/bin/env python
"""Top-op breakdown from a jax.profiler trace (TPU xplane.pb).

The tensorboard profile plugin's converter is version-skewed against the
installed TF in this image, so this parses the XSpace proto directly:
aggregate event duration by HLO op name on the device plane(s), attribute
each op to a framework source (the op_name metadata carries the jit scope),
and print the top-N ops plus a per-model-scope rollup.

Usage:
  python tools/mfu.py --hps ukbb192 --bs 128 --stage_scan --remat \
      --trace_dir /tmp/tr
  python tools/trace_ops.py /tmp/tr [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


def load_xspaces(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        sys.exit(f"no xplane.pb under {trace_dir}")
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append(xs)
    return spaces


SCOPE_PATTERNS = [
    # jit(train_step)/.../encoder/blocks_3/... -> encoder
    (re.compile(r"/encoder/"), "encoder"),
    (re.compile(r"/decoder/.*forward_posterior"), "decoder:posterior"),
    (re.compile(r"/decoder/.*forward_prior"), "decoder:prior"),
    (re.compile(r"/decoder/"), "decoder:other"),
    (re.compile(r"likelihood|dmol|DGauss"), "likelihood"),
    (re.compile(r"transpose\(jvp"), "backward"),
    (re.compile(r"adamw|opt_state|ema", re.I), "optimizer/ema"),
]


def scope_of(op_name: str) -> str:
    for pat, label in SCOPE_PATTERNS:
        if pat.search(op_name):
            return label
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--min_pct", type=float, default=0.3)
    args = ap.parse_args()

    by_op = collections.Counter()  # display name -> ps
    by_scope = collections.Counter()  # framework scope -> ps
    occurrences = collections.Counter()
    total_ps = 0

    for xs in load_xspaces(args.trace_dir):
        for plane in xs.planes:
            # device planes: "/device:TPU:0" (axon) or "TPU:0"; skip host
            if "TPU" not in plane.name or "Host" in plane.name:
                continue
            meta = plane.event_metadata
            stats_meta = plane.stat_metadata
            for line in plane.lines:
                # XLA op lines carry per-op events; step lines duplicate time
                if line.name.startswith("Steps"):
                    continue
                for ev in line.events:
                    md = meta.get(ev.metadata_id)
                    if md is None or not md.name:
                        continue
                    dur = ev.duration_ps
                    name = md.display_name or md.name
                    # long op_name stat (jit scope) if present
                    op_scope = None
                    for st in ev.stats:
                        sm = stats_meta.get(st.metadata_id)
                        if sm is not None and sm.name in ("hlo_op", "op_name", "tf_op"):
                            op_scope = st.str_value or None
                    for st in md.stats:
                        sm = stats_meta.get(st.metadata_id)
                        if sm is not None and sm.name in ("op_name", "tf_op"):
                            op_scope = (
                                st.str_value
                                or (xs.planes and None)
                                or op_scope
                            )
                            if not op_scope and st.ref_value:
                                ref = stats_meta.get(st.ref_value)
                                op_scope = ref.name if ref else None
                    by_op[name] += dur
                    by_scope[scope_of(op_scope or name)] += dur
                    occurrences[name] += 1
                    total_ps += dur

    if total_ps == 0:
        sys.exit("no device-plane op events found")

    print(f"total device op time: {total_ps/1e12*1e3:.2f} ms "
          f"(all steps in trace window)")
    print(f"\n{'%':>6}  {'ms':>9}  {'count':>6}  op")
    shown = 0
    for name, ps in by_op.most_common():
        pct = 100.0 * ps / total_ps
        if pct < args.min_pct or shown >= args.top:
            break
        print(f"{pct:6.2f}  {ps/1e9:9.3f}  {occurrences[name]:6d}  {name[:110]}")
        shown += 1

    print("\nscope rollup (best-effort from op_name metadata):")
    for scope, ps in by_scope.most_common():
        print(f"{100.0*ps/total_ps:6.2f}  {ps/1e9:9.3f}  {scope}")


if __name__ == "__main__":
    main()
