#!/usr/bin/env python
"""Aggregate a captured ``scripts/profile.py`` trace into a per-phase /
per-layer / per-category time table (the reference has no profiling story
at all; this pairs with ``utils/profiling.py`` — SURVEY §5).

Parses the xplane protobuf directly (the tensorboard-plugin-profile
converter in this image is version-skewed against its tensorflow), using
each XLA op event's metadata: ``tf_op`` (jax provenance), ``hlo_category``,
``flops`` and ``bytes_accessed``. Durations are device self-times from the
"XLA Ops" line, divided by the number of profiled steps.

Usage:
  python scripts/analyze_profile.py [--dir ./dataset/experiments/profiles]
      [--steps 3] [--top 25]
"""

import argparse
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_events(profile_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        profile_dir, "plugins", "profile", "*", "*.xplane.pb")))
    if not paths:
        raise SystemExit(f"no xplane.pb under {profile_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    planes = [p for p in space.planes if "/device:TPU" in p.name]
    if not planes:  # CPU capture
        planes = [p for p in space.planes if p.name == "/host:CPU"]
    plane = planes[0]
    em = dict(plane.event_metadata)
    sm = {m.id: m.name for m in plane.stat_metadata.values()}

    def md_stats(md):
        out = {}
        for st in md.stats:
            which = st.WhichOneof("value")
            v = getattr(st, which)
            if which == "ref_value":
                v = sm.get(v, v)
            out[sm.get(st.metadata_id)] = v
        return out

    events = []
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            md = em[ev.metadata_id]
            stats = md_stats(md)
            events.append({
                "dur_us": ev.duration_ps / 1e6,
                "name": md.display_name,
                "tf_op": stats.get("tf_op", ""),
                "category": stats.get("hlo_category", "?"),
                "flops": float(stats.get("flops", 0) or 0),
                "bytes": float(stats.get("bytes_accessed", 0) or 0),
            })
    return events


_PHASES = (
    ("bwd", re.compile(r"transpose\(jvp\(YoloModel\)\)")),
    ("fwd", re.compile(r"jvp\(YoloModel\)")),
    ("loss/assign", re.compile(
        r"loss|assign|iou|one_hot|top_k|argm|softmax|take|cross_entropy",
        re.I)),
    ("optimizer", re.compile(r"adamw?|scale_by|tree_|apply_updates|"
                             r"clip|global_norm", re.I)),
)

_LAYER = re.compile(r"/(net/p\d|fpn|head)\w*/")


def classify(tf_op):
    for phase, pat in _PHASES:
        if pat.search(tf_op):
            return phase
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="./dataset/experiments/profiles")
    ap.add_argument("--steps", type=int, default=3,
                    help="steps the capture spans (profile.py --steps)")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    events = load_events(args.dir)
    total = sum(e["dur_us"] for e in events)

    def table(keyfn, title, top=None):
        agg = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
        for e in events:
            k = keyfn(e)
            a = agg[k]
            a[0] += e["dur_us"]
            a[1] += e["flops"]
            a[2] += e["bytes"]
            a[3] += 1
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        if top:
            rows = rows[:top]
        print(f"\n## {title} (per step, {args.steps}-step capture)")
        print(f"{'key':46s} {'ms':>8s} {'%':>6s} {'TFLOP/s':>8s} "
              f"{'GB/s':>8s} {'ops':>6s}")
        for k, (us, fl, by, n) in rows:
            ms = us / 1e3 / args.steps
            sec = us / 1e6
            print(f"{str(k)[:46]:46s} {ms:8.2f} {100*us/total:6.1f} "
                  f"{(fl/sec/1e12 if sec else 0):8.1f} "
                  f"{(by/sec/1e9 if sec else 0):8.0f} {n:6d}")

    print(f"total device time/step: {total/1e3/args.steps:.2f} ms "
          f"({len(events)} op events)")
    table(lambda e: classify(e["tf_op"]), "phase")
    table(lambda e: (classify(e["tf_op"]),
                     (_LAYER.search(e["tf_op"]) or [None]).group(1)
                     if _LAYER.search(e["tf_op"]) else "-"),
          "phase × layer", top=args.top)
    table(lambda e: e["category"], "hlo category", top=15)
    table(lambda e: e["tf_op"].split("/")[-1][:46] or e["name"],
          "hottest ops", top=args.top)


if __name__ == "__main__":
    main()
