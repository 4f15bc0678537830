#!/usr/bin/env python3
"""Dev-side bench artifact tooling (round-14 verdict task 1).

  bench_drift.py drift <prior.json> <candidate.json>  -> per-query drift table
  bench_drift.py ledger <out.json> <attempt1.json> [attempt2.json ...]
                                                      -> attempts ledger

The drift table lets a judge confirm the stall-retry machinery masked no
genuine regression: per query, the prior committed median, the candidate
median, the delta, and both runs' calib context ride together.
"""
import json
import sys


def calib_ctx(d):
    c = d.get("calib") or {}
    s = c.get("series") or []
    return {
        "single_s": c.get("single_s"),
        "parallel_med": c.get("parallel_med"),
        "spread": round(max(s) / min(s), 4) if s else None,
    }


def drift(prior_path, cand_path):
    prior = json.load(open(prior_path))
    cand = json.load(open(cand_path))
    pq, cq = prior.get("queries", {}), cand.get("queries", {})
    rows = {}
    for name in sorted(set(pq) | set(cq)):
        p, c = pq.get(name), cq.get(name)
        rows[name] = {
            "prior_s": p,
            "now_s": c,
            "delta_pct": round((c - p) / p * 100.0, 1)
            if isinstance(p, (int, float)) and isinstance(c, (int, float)) and p > 0
            else None,
        }
    deltas = [r["delta_pct"] for r in rows.values() if r["delta_pct"] is not None]
    deltas.sort()
    out = {
        "note": "per-query median drift of the accepted candidate vs the prior "
        "committed curated artifact; both runs' calib context attached so a "
        "regression can be told apart from residual host noise",
        "prior": {"src": prior_path, "total": prior.get("value"),
                  "calib": calib_ctx(prior)},
        "candidate": {"src": cand_path, "total": cand.get("value"),
                      "calib": calib_ctx(cand)},
        "median_delta_pct": deltas[len(deltas) // 2] if deltas else None,
        "worst_regressions": sorted(
            ((n, r["delta_pct"]) for n, r in rows.items()
             if r["delta_pct"] is not None),
            key=lambda t: -t[1])[:10],
        "queries": rows,
    }
    return out


def ledger(paths):
    attempts = []
    for p in paths:
        d = json.load(open(p))
        s = (d.get("calib") or {}).get("series") or []
        attempts.append({
            "total": d.get("value"),
            "total_min": d.get("total_min"),
            "calib_spread": round(max(s) / min(s), 4) if s else None,
            "calib_series": s,
            "load_peak": d.get("load_peak"),
            "loadavg_start": d.get("loadavg_start"),
            "loadavg_end": d.get("loadavg_end"),
            "stall_retries": {k: v.get("samples", v) if isinstance(v, dict) else v
                              for k, v in (d.get("stall_retries") or {}).items()},
        })
    return attempts


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "drift":
        print(json.dumps(drift(sys.argv[2], sys.argv[3]), indent=1))
    elif mode == "ledger":
        print(json.dumps(ledger(sys.argv[2:]), indent=1))
    else:
        sys.exit(f"unknown mode {mode}")
