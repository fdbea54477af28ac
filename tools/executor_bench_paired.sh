#!/bin/bash
# PAIRED scaling harness: the noise-robust companion to
# executor_bench.sh. Same N vs 4N executor shapes (1 pinned local[8]
# JVM over the full corpus vs 4 concurrent pinned local[8] JVMs over
# staged chunk quarters), but all FIVE JVMs stay alive for the whole
# session and a file-token barrier alternates their measured passes
# round-by-round:
#
#   round r:  single runs pass r  ->  the 4 executors run pass r
#
# Rationale (BENCH/BASELINE.md variance section): this VM's host-steal
# bursts slow everything uniformly for multi-minute windows. The
# sequential harness measures the two configurations in DIFFERENT
# windows, so a burst poisons whichever configuration it lands on and
# the pooled median becomes an unpaired noise statistic. Here each
# round's single and 4-exec passes are adjacent in time, so the
# per-round efficiency RATIO absorbs common-mode noise; the headline
# is the median of per-round ratios, every round reported.
set -e
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JAVA_ARGS="$OPENS -Xms4g -Xmx4g -XX:+AlwaysPreTouch -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_SKIP_INVOICE=1
# 72k default: per-pass fixed cost (job submission, broadcast builds,
# AQE stage scheduling) multiplies by 4 in the multi-JVM stand-in while
# a real 4N-executor cluster pays it once per job — a sandbox artifact
# worth ~4-5% efficiency at 36k that halves at 72k (measured: paired
# median 0.793 @36k -> 0.826 @72k). Session cost ~40 min.
export SPARK_GRAFT_BENCH_DOCS=${DOCS:-72000} SPARK_GRAFT_CPUS=8
ROUNDS=${ROUNDS:-5}
export SPARK_GRAFT_MEASURE_RUNS=$ROUNDS SPARK_GRAFT_WARMUP_RUNS=${WARMUP_RUNS:-2}
OUT=${OUT:-/tmp/execbench_paired}
SYNC=$OUT/sync
rm -rf $SYNC; mkdir -p $OUT $SYNC
export SPARK_GRAFT_SYNC_DIR=$SYNC

echo "== warm corpus (generate + chunk-stage once) =="
env -u SPARK_GRAFT_SYNC_DIR SPARK_GRAFT_STAGE_CHUNKS=4 \
  taskset -c 0-31 java -cp "$CP" $JAVA_ARGS -Xmx64g graft.tools.CorpusWarm 2>/dev/null

echo "== launching 5 JVMs (1 single + 4 executors), all stay alive =="
SPARK_GRAFT_SYNC_ROLE=single taskset -c 0-7 \
  java -cp "$CP" $JAVA_ARGS graft.Bench > $OUT/single.json 2>/dev/null &
for i in 0 1 2 3; do
  lo=$((i*8)); hi=$((i*8+7))
  SPARK_GRAFT_SYNC_ROLE=e$i SPARK_GRAFT_CHUNK=$i/4 taskset -c $lo-$hi \
    java -cp "$CP" $JAVA_ARGS graft.Bench > $OUT/e$i.json 2>/dev/null &
done

await() { while [ ! -e "$1" ]; do sleep 0.2; done }
echo "== waiting for all JVMs to finish warm-up =="
for role in single e0 e1 e2 e3; do await $SYNC/ready_$role; done

for r in $(seq 1 $ROUNDS); do
  echo "== round $r: single pass =="
  touch $SYNC/go_single_$r; await $SYNC/done_single_$r
  echo "== round $r: 4-exec pass =="
  for i in 0 1 2 3; do touch $SYNC/go_e${i}_$r; done
  for i in 0 1 2 3; do await $SYNC/done_e${i}_$r; done
done
wait

python3 - "$OUT" "$ROUNDS" <<'PYEOF'
import json, sys, statistics
out, rounds = sys.argv[1], int(sys.argv[2])
def load(f):
    return json.loads(open(f).read().strip().splitlines()[-1])
s = load(f"{out}/single.json")
execs = [load(f"{out}/e{i}.json") for i in range(4)]
total_docs = sum(e['bench_docs'] for e in execs)
ratios = []
for r in range(rounds):
    t1 = s['bench_docs'] / s['extract_secs'][r]
    t4 = total_docs / max(e['extract_secs'][r] for e in execs)
    eff = (t4 / t1) / 4
    ratios.append(eff)
    print(f"round {r+1}: single {t1:7.1f} docs/s ({s['extract_secs'][r]:6.1f}s)"
          f" -> 4-exec {t4:7.1f} docs/s"
          f" (walls {[round(e['extract_secs'][r],1) for e in execs]})"
          f"  EFFICIENCY {eff:.3f}")
print(f"paired efficiency: median {statistics.median(ratios):.3f}, "
      f"best {max(ratios):.3f}, worst {min(ratios):.3f}, all "
      f"{[round(x,3) for x in ratios]}")
PYEOF
