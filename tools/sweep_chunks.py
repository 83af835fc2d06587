#!/usr/bin/env python3
"""Chunked fresh-JVM full sweep.

The single-JVM 173-query sweep shows in-session degradation: successive
interleaved passes read 12% -> 34% of queries with > 50% rep spread on
an idle box, while any ~10-30 query subset in a fresh JVM reads 5-30%
max. Chunking the sweep across fresh JVMs removes the accumulation by
construction; each chunk keeps Bench's own discipline (warm-up pass,
discarded first interleaved pass, >= 3 timed reps, hot-window restarts,
per-query min + median + spread, deviation vs the committed sweep, the
pinned-baseline regression gate), and the merge refuses to write the
sweep artifact unless EVERY chunk captured fully stable (contended=false
AND hot_fraction=0 — the same stricter bar Bench applies to its own
SPARK_GRAFT_SWEEP_OUT write path, since this artifact anchors later
rounds' comparisons).

Usage: python3 tools/sweep_chunks.py [out.json] [chunk_size]
"""
import json, os, subprocess, sys

out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SWEEP_r17.json"
chunk_size = int(sys.argv[2]) if len(sys.argv) > 2 else 25

# the full declared surface, from the newest correctness artifact
# (its keys are diffed against the registry every round)
corr = sorted(f for f in os.listdir(".") if f.startswith("CORRECTNESS_r"))
names = sorted(json.load(open(corr[-1])).keys())
chunks = [names[i:i + chunk_size] for i in range(0, len(names), chunk_size)]
print(f"[sweep-chunks] {len(names)} queries in {len(chunks)} chunks of <= {chunk_size}")

merged_q, merged_med, merged_spread, merged_shuffle = {}, {}, {}, {}
merged_regressions = {}
chunk_meta = []
contended_any = False
hot_any = False
for i, chunk in enumerate(chunks):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = env.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env["SPARK_GRAFT_CPUS"] = env.get("SPARK_GRAFT_CPUS", "32")
    env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(chunk)
    env.pop("SPARK_GRAFT_SWEEP_OUT", None)  # the merge owns the artifact
    env.pop("SPARK_GRAFT_BENCH_GATE", None)  # gate judged at merge, not mid-sweep
    # a stale BENCH_LAST.json from the previous chunk (or any prior run)
    # must never be silently read back as THIS chunk's results: remove it
    # first and fail loudly if the chunk did not rewrite it
    try:
        os.remove("BENCH_LAST.json")
    except FileNotFoundError:
        pass
    log = f"/tmp/sweep_chunk_{i}.log"
    print(f"[sweep-chunks] chunk {i + 1}/{len(chunks)} ({len(chunk)} queries) -> {log}")
    with open(log, "w") as lf:
        rc = subprocess.call(["sbt", "runMain graft.Bench"], env=env,
                             stdout=lf, stderr=subprocess.STDOUT)
    if rc != 0:
        print(f"[sweep-chunks] chunk {i} sbt exited {rc}; see {log}")
        sys.exit(2)
    if not os.path.exists("BENCH_LAST.json"):
        print(f"[sweep-chunks] chunk {i} exited 0 but wrote no "
              f"BENCH_LAST.json — refusing to merge; see {log}")
        sys.exit(2)
    d = json.load(open("BENCH_LAST.json"))
    merged_q.update(d["queries"])
    merged_med.update(d.get("median", {}))
    merged_spread.update(d.get("spread_pct", {}))
    merged_shuffle.update(d.get("shuffle_mb", {}))
    merged_regressions.update(d.get("regressions", {}))
    chunk_meta.append({
        "chunk": i, "queries": len(chunk), "reps": d.get("reps"),
        "restarts": d.get("restarts"), "load_1m_at_start": d.get("load_1m_at_start"),
        "max_spread_pct": d.get("max_spread_pct"),
        "hot_fraction_pct": d.get("hot_fraction_pct"),
        "outlier_reps": d.get("outlier_reps"),
        "sweep_deviation_pct": d.get("sweep_deviation_pct"),
        "regression_gate": d.get("regression_gate"),
        "contended": d.get("contended")})
    if d.get("contended"):
        contended_any = True
        print(f"[sweep-chunks] chunk {i} CONTENDED: {chunk_meta[-1]}")
    if (d.get("hot_fraction_pct") or 0) > 0:
        hot_any = True
        print(f"[sweep-chunks] chunk {i} hot_fraction "
              f"{d.get('hot_fraction_pct')}%: {chunk_meta[-1]}")

failed = sum(1 for v in merged_q.values() if v < 0)
total = sum(v for v in merged_q.values() if v >= 0)
max_spread = max(merged_spread.values()) if merged_spread else 0.0
outlier_total = sum(c.get("outlier_reps") or 0 for c in chunk_meta)
devs = [c["sweep_deviation_pct"] for c in chunk_meta
        if c.get("sweep_deviation_pct") is not None]
sweep_dev = sorted(devs)[len(devs) // 2] if devs else None
gates = [c.get("regression_gate") for c in chunk_meta]
if any(g == "fail" for g in gates):
    regression_gate = "fail"
elif all(g in (None, "no-baseline") for g in gates):
    regression_gate = "no-baseline"
elif any(g == "skipped-contended" for g in gates):
    regression_gate = "partial-skipped"
else:
    regression_gate = "pass"

artifact = {
    "metric": "total", "value": total, "unit": "sec",
    "queries": dict(sorted(merged_q.items())),
    "shuffle_mb": dict(sorted(merged_shuffle.items())),
    "sf": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    "failed": failed,
    "materialization": "noop-sink",
    "methodology": (
        f"chunked fresh-JVM sweep ({len(chunks)} chunks of <= {chunk_size} "
        "queries, one JVM each): per chunk, Bench's per-query warm run, one "
        "discarded interleaved pass, >= 3 interleaved timed reps with "
        "hot-window restarts, per-query min + median; chunking removes the "
        "single-JVM 173-query session degradation (passes read 12->34% hot "
        "on an idle box; any small subset reads clean) so the spread gate "
        "measures contention, not accumulation; merge refuses the artifact "
        "unless every chunk reads contended=false AND hot_fraction=0; "
        "per-query regression gate judged vs the pinned BENCH_BASELINE.json"),
    "median": dict(sorted(merged_med.items())),
    "spread_pct": dict(sorted(merged_spread.items())),
    "max_spread_pct": round(max_spread, 1),
    "hot_fraction_pct": 0.0 if not hot_any else round(
        100.0 * sum(1 for v in merged_spread.values() if v > 50.0)
        / max(len(merged_spread), 1), 1),
    "outlier_reps": outlier_total,
    "contended": contended_any,
    "regression_gate": regression_gate,
    "regressions": dict(sorted(merged_regressions.items())),
    "chunks": chunk_meta,
}
if sweep_dev is not None:
    artifact["sweep_deviation_pct"] = round(sweep_dev, 1)
    artifact["sweep_ref"] = "per-chunk vs newest committed BENCH_SWEEP_r*.json"

if contended_any or hot_any:
    print("[sweep-chunks] REFUSING to write sweep artifact: a chunk captured "
          "contended or with nonzero hot_fraction — rerun on a quiet host")
    json.dump(artifact, open("/tmp/sweep_chunks_refused.json", "w"))
    sys.exit(3)
json.dump(artifact, open(out_path, "w"), separators=(",", ":"))
print(f"[sweep-chunks] wrote {out_path}: total {total:.1f}s, "
      f"max spread {max_spread:.1f}%, contended=false, "
      f"regression_gate={regression_gate}")
if regression_gate == "fail":
    print("[sweep-chunks] REGRESSION GATE FAIL: " +
          ", ".join(f"{k} +{v}%" for k, v in sorted(merged_regressions.items())))
    sys.exit(4)
