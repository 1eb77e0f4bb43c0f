#!/usr/bin/env python3
"""Automated per-query bench-outlier triage (VERDICT r17 ask #3).

Replaces the ad-hoc top-10 scan that missed `text_bm25_indexed` in r16:
every default-path bench run appends its FULL per-query map to
bench/BENCH_history.jsonl, so regressions are detectable per query
against the whole archive, not just against the previous round's
headline or the calibration anchor subset.

Method (the r15-r17 adjudication discipline, mechanized):
  1. Window-normalize each run's per-query seconds by its own heavy
     calibration frame's trimmed median ratio (`calibration_r14.
     median_ratio` — >=1s anchors, trim-2; the host-speed normalizer
     the round verdicts use). Runs without an applicable frame keep
     raw seconds and are marked so.
  2. For the run under triage (default: the newest history line; or a
     bench JSON passed with --new), flag any query whose normalized
     reading exceeds --ratio (default 1.3) x its normalized HISTORY
     ANCHOR (the run itself excluded). Anchor default is the MINIMUM —
     the clean-run floor the A/Bs compare against (the archive's
     recurring pattern is a heavy draw on a stable query). The min is
     biased low as the archive deepens (a single new draw compares
     unfavorably to a best-of-N-runs floor), so when even the light
     canaries flag, re-run with --anchor median to separate real
     drift from min-anchor tightening.
  3. Also report queries with no history (new registrations - nothing
     to compare) and tiny-time flags suppressed below --floor seconds
     (scheduling noise dominates sub-half-second readings).

The output is the round's WATCH LIST - candidates for the interleaved
fresh-JVM A/B (BENCH_NOTES "Round 16" methodology), NOT verdicts:
attribution (environment vs code) still requires the A/B + git -L
receipts.

Usage:
  python3 tools/bench_triage.py                      # triage newest line
  python3 tools/bench_triage.py --new bench/BENCH_full.json
  python3 tools/bench_triage.py --ratio 1.25 --floor 0.4 --json out.json

(dev tool; reads bench/BENCH_history.jsonl relative to the repo root
or --history)
"""
import argparse
import json
import os
import sys


def load_lines(path):
    lines = []
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if ln:
                lines.append(json.loads(ln))
    return lines


def norm_factor(run):
    """Host-speed divisor for a run: the heavy frame's trimmed median
    ratio vs the r14 driver anchor, when the frame applied."""
    cal = run.get("calibration_r14") or {}
    if cal.get("applicable") and cal.get("median_ratio"):
        return float(cal["median_ratio"]), True
    return 1.0, False


def normalized_queries(run):
    f, applicable = norm_factor(run)
    return {q: t / f for q, t in (run.get("queries") or {}).items()}, applicable


def run_order(run):
    """The execution order of a run's queries. Bench.scala runs sorted
    key order by default; with SPARK_GRAFT_BENCH_ORDER_SEED set it runs
    the md5(seed:name)-keyed shuffle and records the seed on the line
    (`run_order_seed`), which this mirrors exactly."""
    import hashlib
    names = sorted((run.get("queries") or {}).keys())
    # `is not None`, not truthiness: Bench treats an EMPTY env seed as a
    # real seed and shuffles with it, so "" must reconstruct that shuffle
    seed = run.get("run_order_seed")
    if seed is not None:
        names.sort(key=lambda n:
                   (hashlib.md5(f"{seed}:{n}".encode()).hexdigest(), n))
    return names


def _median(vals):
    if not vals:
        return None
    v = sorted(vals)
    k = len(v)
    return v[k // 2] if k % 2 else (v[k // 2 - 1] + v[k // 2]) / 2


def burst_span(target, ref_lines, flags, gap=3):
    """Execution-order contiguity detector (VERDICT r18 ask #2). A
    mid-run HOST burst inflates whatever queries happened to be running
    — which, under a deterministic run order, is a CONTIGUOUS span of
    run positions (r18: 19 of 21 flags fell in ONE 26-query
    alphabetical span at median 1.84x its same-tree close, vs 1.07x
    outside). Neither the min/median anchors nor the run-wide
    calibration frame can see this: canaries spread across the whole
    run dilute a localized burst. Method: cluster the flagged queries'
    run positions (split where more than `gap` unflagged queries
    intervene), take the largest cluster as the candidate span, and
    compare the inside-vs-outside per-query median ratio against the
    newest archived run sharing >=80% of the query set (ideally the
    newest same-tree close). Suspected-burst when the span holds >=2/3
    of all flags AND inside/outside >= 1.3."""
    order = run_order(target)
    pos = {n: i for i, n in enumerate(order)}
    fpos = sorted(pos[f["query"]] for f in flags if f["query"] in pos)
    if len(fpos) < 3:
        return None
    clusters, cur = [], [fpos[0]]
    for p in fpos[1:]:
        if p - cur[-1] <= gap + 1:
            cur.append(p)
        else:
            clusters.append(cur)
            cur = [p]
    clusters.append(cur)
    big = max(clusters, key=len)
    lo, hi = big[0], big[-1]
    tgt_q = target.get("queries") or {}
    ref = None
    for r in reversed(ref_lines):
        shared = set(r.get("queries") or {}) & set(tgt_q)
        if len(shared) >= 0.8 * len(tgt_q):
            ref = r
            break
    inside, outside = [], []
    if ref:
        rq = ref["queries"]
        for n, t in tgt_q.items():
            if n in rq and rq[n] > 0.05 and n in pos:
                (inside if lo <= pos[n] <= hi else outside).append(t / rq[n])
    mi, mo = _median(inside), _median(outside)
    return {
        "span_first": order[lo],
        "span_last": order[hi],
        "span_len": hi - lo + 1,
        "flags_in_span": len(big),
        "flags_total": len(fpos),
        "ref_wall_clock_ms": ref.get("wall_clock_ms") if ref else None,
        "inside_median_ratio_vs_ref": round(mi, 3) if mi is not None else None,
        "outside_median_ratio_vs_ref": round(mo, 3) if mo is not None else None,
        "suspected_burst": bool(
            len(big) * 3 >= len(fpos) * 2 and mi is not None
            and mo is not None and mo > 0 and mi / mo >= 1.3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--history", default="bench/BENCH_history.jsonl")
    ap.add_argument("--new", default=None,
                    help="bench JSON to triage (default: newest history line)")
    ap.add_argument("--ratio", type=float, default=1.3,
                    help="flag when normalized reading > ratio x history anchor")
    ap.add_argument("--anchor", choices=["min", "median"], default="min",
                    help="history anchor: 'min' (the clean-run floor the "
                         "A/Bs compare against; biased low as the archive "
                         "deepens - every new single draw compares "
                         "unfavorably to a best-of-N-runs floor) or "
                         "'median' (robust to draw dispersion; use it to "
                         "separate real drift from min-anchor tightening "
                         "when even the light canaries flag)")
    ap.add_argument("--floor", type=float, default=0.5,
                    help="suppress flags whose normalized reading is below "
                         "this many seconds (scheduling noise regime)")
    ap.add_argument("--json", default=None, help="also write the watch list here")
    args = ap.parse_args()

    if not os.path.exists(args.history):
        sys.exit(f"no history at {args.history} (run from the repo root or pass --history)")
    history = load_lines(args.history)
    if not history:
        sys.exit(f"{args.history} is empty")

    if args.new:
        with open(args.new) as f:
            target = json.load(f)
        target_label = args.new
        # drop any history line that IS the target so a run already
        # appended to the archive never anchors itself. Identity is
        # wall_clock present on BOTH sides and equal AND the full
        # per-query map equal (r18 ADVICE #2: `!=` on a missing field
        # compared None == None and silently dropped every legacy line
        # without the field; and a timestamp alone could collide).
        def _same_run(a, b):
            wa, wb = a.get("wall_clock_ms"), b.get("wall_clock_ms")
            return (wa is not None and wa == wb
                    and a.get("queries") == b.get("queries"))
        ref_lines = [r for r in history if not _same_run(target, r)]
    else:
        target = history[-1]
        target_label = f"{args.history}[-1]"
        ref_lines = history[:-1]
    if not ref_lines:
        sys.exit("no reference runs to compare against (history has only the target)")

    tgt_q, tgt_cal = normalized_queries(target)
    tgt_factor, _ = norm_factor(target)

    # per-query normalized history anchor + which run held it (min) or
    # a median over all runs carrying the query
    series = {}
    for i, run in enumerate(ref_lines):
        nq, _ = normalized_queries(run)
        for q, t in nq.items():
            series.setdefault(q, []).append((t, i))
    hist_min = {}
    for q, pts in series.items():
        if args.anchor == "min":
            hist_min[q] = min(pts)
        else:
            hist_min[q] = (_median([t for t, _ in pts]), -1)

    flags, fresh, below_floor = [], [], []
    for q, t in sorted(tgt_q.items()):
        if q not in hist_min:
            fresh.append(q)
            continue
        mn, run_idx = hist_min[q]
        r = t / mn if mn > 0 else float("inf")
        if r > args.ratio:
            if t < args.floor:
                below_floor.append((q, t, mn, r))
            else:
                flags.append({
                    "query": q,
                    "normalized_s": round(t, 3),
                    "history_min_s": round(mn, 3),
                    "ratio_vs_min": round(r, 3),
                    "raw_s": round(tgt_q[q] * tgt_factor, 3),
                    "min_run_index": run_idx,
                })
    flags.sort(key=lambda f: -f["ratio_vs_min"])

    # execution-order contiguity: annotate span-clustered flags as
    # suspected-burst BEFORE anyone A/Bs 20 queries one by one
    span = burst_span(target, ref_lines, flags)
    if span:
        order = run_order(target)
        pos = {n: i for i, n in enumerate(order)}
        lo, hi = pos[span["span_first"]], pos[span["span_last"]]
        for f in flags:
            f["in_burst_span"] = bool(
                span["suspected_burst"]
                and lo <= pos.get(f["query"], -1) <= hi)

    print(f"target: {target_label}  "
          f"({len(tgt_q)} queries, window factor {tgt_factor:.3f}"
          f"{'' if tgt_cal else ' [NO applicable heavy frame - raw seconds]'})")
    print(f"reference: {len(ref_lines)} archived runs, "
          f"{len(hist_min)} queries with history")
    print(f"threshold: > {args.ratio} x normalized history {args.anchor}, "
          f"floor {args.floor}s\n")
    if flags:
        print(f"WATCH LIST ({len(flags)}) - A/B these (fresh-JVM interleaved, "
              "family-mate control, git log -L receipts):")
        for f in flags:
            tag = "  [burst-span]" if f.get("in_burst_span") else ""
            print(f"  {f['query']:40s} {f['normalized_s']:7.2f}s norm "
                  f"(raw {f['raw_s']:.2f})  vs min {f['history_min_s']:.2f}s "
                  f"= x{f['ratio_vs_min']:.2f}{tag}")
    else:
        print("WATCH LIST: empty - no query exceeds the threshold")
    if span:
        verdict = ("SUSPECTED HOST BURST - A/B the span as one event, "
                   "not query by query" if span["suspected_burst"]
                   else "no burst signature")
        print(f"\nexecution-order contiguity: {span['flags_in_span']}/"
              f"{span['flags_total']} flags in the contiguous span "
              f"{span['span_first']} .. {span['span_last']} "
              f"({span['span_len']} positions); per-query median ratio vs "
              f"newest shared-archive run: inside "
              f"{span['inside_median_ratio_vs_ref']}, outside "
              f"{span['outside_median_ratio_vs_ref']} -> {verdict}")
    if fresh:
        print(f"\nno history ({len(fresh)}): {', '.join(fresh)}")
    if below_floor:
        names = ", ".join(q for q, *_ in below_floor)
        print(f"\nsuppressed below {args.floor}s floor ({len(below_floor)}): {names}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"target": target_label, "window_factor": tgt_factor,
                       "ratio_threshold": args.ratio, "anchor": args.anchor, "floor_s": args.floor,
                       "watch": flags, "burst_span": span, "no_history": fresh,
                       "suppressed_below_floor": [q for q, *_ in below_floor]},
                      f, indent=2)
        print(f"\nwritten: {args.json}")
    # exit 0 either way: the tool emits a watch list, not a gate verdict


if __name__ == "__main__":
    main()
