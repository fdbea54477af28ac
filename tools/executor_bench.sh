#!/bin/bash
# Multi-JVM executor-style scaling harness: 1 pinned local[8] JVM over
# the full corpus vs 4 concurrent pinned local[8] JVMs over disjoint
# chunk quarters — the sandbox model of N vs 4N executors (separate
# heaps, separate GC, separate code caches; shared only DRAM+disk).
set -e
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
SCALA_LIB=$(ls /opt/spark/jars/scala-library*.jar 2>/dev/null | head -1)
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
# fixed pre-touched heap: lazy heap commit caused cross-JVM page-fault
# storms (35-48% system time, half the cores idle — measured round 2);
# pretouch moved 4-exec walls from 68-84s to 52-55s on the 36k corpus.
# 4g (round 3, was 12g): vmstat during 4-exec launch showed 97-99%
# SYSTEM time for 200+s — 4x12g concurrent pretouch faults 48 GB of
# fresh anon memory through the hypervisor at EVERY JVM launch,
# bleeding past warmup into measured passes (the trial-level 3x
# outliers). 4 GB still holds the working set (each executor processes
# a ~370 MB staged quarter) and cuts the pretouch storm to ~25 s,
# fully absorbed by the warm-up pass. Same per-executor heap in both
# configurations.
JAVA_ARGS="$OPENS -Xms4g -Xmx4g -XX:+AlwaysPreTouch -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_SKIP_INVOICE=1
# 36k docs: the evidence corpus. Smaller corpora leave 4-exec measured
# passes at 12-20s where fixed per-pass cost (job scheduling, stage
# setup) dominates and efficiency reads artificially low (W >> f fit,
# BENCH/BASELINE.md)
export SPARK_GRAFT_BENCH_DOCS=${DOCS:-36000} SPARK_GRAFT_CPUS=8
# 5 measured passes per JVM launch and 2 warm-up passes: this box's
# host-steal bursts slow ALL JVMs uniformly for 30-60s windows, and a
# burst landing on a measured pass drags the per-pass aggregate; with
# 10 pooled passes per configuration the median survives a burst
# window. The second warm-up keeps the concurrent JVM-launch pretouch
# storm out of measured pass 1 (it outlasted one warm-up ~half the
# sessions). All pass values are retained in the JSON.
export SPARK_GRAFT_MEASURE_RUNS=${MEASURE_RUNS:-5}
export SPARK_GRAFT_WARMUP_RUNS=${WARMUP_RUNS:-2}
TRIALS=${TRIALS:-2}
OUT=${OUT:-/tmp/execbench}
mkdir -p $OUT

run_one() { # $1=cpulist $2=chunk-spec $3=outfile
  if [ -n "$2" ]; then CHUNK_ENV="SPARK_GRAFT_CHUNK=$2"; else CHUNK_ENV=""; fi
  env $CHUNK_ENV taskset -c $1 java -cp "$CP" $JAVA_ARGS graft.Bench > $3 2>/dev/null
}

echo "== warm corpus (generate + chunk-stage once) =="
SPARK_GRAFT_STAGE_CHUNKS=4 taskset -c 0-31 java -cp "$CP" $JAVA_ARGS -Xmx64g graft.tools.CorpusWarm 2>/dev/null

# interleaved trials: single and 4-exec alternate so bursty VM steal
# hits both configurations equally
for t in $(seq 1 $TRIALS); do
  echo "== trial $t: single executor 1x local[8] on cores 0-7, full corpus =="
  run_one 0-7 "" $OUT/single_$t.json
  grep -o '"extract_sec":[0-9.]*' $OUT/single_$t.json | tail -1

  echo "== trial $t: 4 executors 4x local[8], disjoint cores + chunk quarters =="
  run_one 0-7   0/4 $OUT/e0_$t.json &
  run_one 8-15  1/4 $OUT/e1_$t.json &
  run_one 16-23 2/4 $OUT/e2_$t.json &
  run_one 24-31 3/4 $OUT/e3_$t.json &
  wait
done

python3 - "$OUT" "$TRIALS" <<'PYEOF'
import json, sys, glob, statistics
out, trials = sys.argv[1], int(sys.argv[2])
def load(f):
    return json.loads(open(f).read().strip().splitlines()[-1])
# Per-PASS aggregation: the 4 JVMs run their measured passes
# concurrently, so pass p's aggregate wall = max over JVMs of THEIR
# pass p. Taking each JVM's best-of-all-passes (different time
# windows) can exceed any throughput actually sustained concurrently.
singles, aggs = [], []
for t in range(1, trials + 1):
    s = load(f"{out}/single_{t}.json")
    s_secs = s.get('extract_secs', [s['extract_sec']])
    singles += [s['bench_docs'] / sec for sec in s_secs]
    execs = [load(f"{out}/e{i}_{t}.json") for i in range(4)]
    total_docs = sum(e['bench_docs'] for e in execs)
    e_secs = [e.get('extract_secs', [e['extract_sec']]) for e in execs]
    npass = min(len(x) for x in e_secs)
    trial_aggs = [total_docs / max(x[p] for x in e_secs) for p in range(npass)]
    aggs += trial_aggs
    print(f"trial {t}: single passes {[round(x,1) for x in s_secs]}s; "
          f"4-exec per-pass agg {[round(a,1) for a in trial_aggs]} docs/s "
          f"(per-JVM passes {[[round(v,1) for v in x] for x in e_secs]})")
for name, f in [("best", max), ("median", statistics.median)]:
    t1, t4 = f(singles), f(aggs)
    print(f"{name}: single {t1:.1f} -> 4-exec {t4:.1f} docs/s, "
          f"EFFICIENCY {(t4/t1)/4:.3f}")
PYEOF
