#!/usr/bin/env python3
"""Dev-side scale-ladder analysis: fit per-query scaling exponents from
Bench detail dumps at increasing scale factors.

Usage: python3 tools/scale_ladder.py out.json rung1.json:scale1 rung2.json:scale2 [...]

Each rung is a BENCH_DETAIL-format json (SPARK_GRAFT_DETAIL_OUT dump) plus
its relative data scale (e.g. 0.01, 0.1, 0.5). For each query present in
all rungs, fits alpha in t ~ n^alpha over the TOP span (the largest two
scales — small rungs are fixed-overhead-dominated) and over the full
ladder (log-log least squares). Queries faster than MIN_SEC at the top
rung are reported with alpha=null: their timing is session overhead, not
plan cost, and an exponent fit on noise would be disinformation.
"""
import json, math, sys

MIN_SEC = 0.5


def main():
    out_path = sys.argv[1]
    rungs = []
    for arg in sys.argv[2:]:
        path, scale = arg.rsplit(":", 1)
        d = json.load(open(path))
        rungs.append((float(scale), d))
    rungs.sort(key=lambda x: x[0])
    scales = [s for s, _ in rungs]
    common = set.intersection(*(set(d["queries"]) for _, d in rungs))
    queries = {}
    for name in sorted(common):
        ts = [d["queries"][name]["min"] for _, d in rungs]
        ok = all(d["queries"][name]["ok"] for _, d in rungs)
        top = None
        if ok and ts[-1] >= MIN_SEC:
            top = math.log(ts[-1] / ts[-2]) / math.log(scales[-1] / scales[-2])
        # least-squares slope over the full ladder
        full = None
        if ok and ts[-1] >= MIN_SEC:
            xs = [math.log(s) for s in scales]
            ys = [math.log(t) for t in ts]
            mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
            full = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / \
                sum((x - mx) ** 2 for x in xs)
        queries[name] = {
            "sec": dict(zip([str(s) for s in scales], ts)),
            "ok": ok,
            "alpha_top": round(top, 2) if top is not None else None,
            "alpha_full": round(full, 2) if full is not None else None,
        }
    # family rollup: prefix before first '_', alpha = exponent of the
    # family's summed time over the top span (weighted by cost, which is
    # what matters for the total).
    fams = {}
    for name, q in queries.items():
        fams.setdefault(name.split("_")[0], []).append(q)
    families = {}
    for f, qs in sorted(fams.items()):
        sums = [sum(q["sec"][str(s)] for q in qs) for s in scales]
        alpha = math.log(sums[-1] / sums[-2]) / math.log(scales[-1] / scales[-2])
        families[f] = {
            "sec": dict(zip([str(s) for s in scales], [round(x, 2) for x in sums])),
            "n_queries": len(qs),
            "alpha_top": round(alpha, 2),
        }
    result = {"scales": scales, "min_sec_for_fit": MIN_SEC,
              "families": families, "queries": queries}
    json.dump(result, open(out_path, "w"), indent=1)
    print(f"{'family':<12} {'n':>3} " +
          " ".join(f"{s:>8}" for s in scales) + "  alpha_top")
    for f, v in sorted(families.items(), key=lambda kv: -kv[1]["alpha_top"]):
        print(f"{f:<12} {v['n_queries']:>3} " +
              " ".join(f"{v['sec'][str(s)]:>8.2f}" for s in scales) +
              f"  {v['alpha_top']:>6.2f}")
    worst = [(n, q) for n, q in queries.items()
             if q["alpha_top"] is not None and q["alpha_top"] > 1.3]
    if worst:
        print("\nqueries with alpha_top > 1.3 (superlinear watch list):")
        for n, q in sorted(worst, key=lambda kv: -kv[1]["alpha_top"]):
            print(f"  {n:<32} {q['alpha_top']:>5.2f}  " +
                  " ".join(f"{q['sec'][str(s)]:.2f}s" for s in scales))


if __name__ == "__main__":
    main()
