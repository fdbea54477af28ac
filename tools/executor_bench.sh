#!/bin/bash
# Multi-JVM executor-style scaling harness: 1 pinned local[8] JVM over
# the full corpus vs 4 concurrent pinned local[8] JVMs over disjoint
# chunk quarters — the sandbox model of N vs 4N executors (separate
# heaps, separate GC, separate code caches; shared only DRAM+disk).
set -e
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
SCALA_LIB=$(ls /opt/spark/jars/scala-library*.jar 2>/dev/null | head -1)
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JAVA_ARGS="$OPENS -Xmx14g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_BENCH_DOCS=${DOCS:-9000} SPARK_GRAFT_CPUS=8
OUT=${OUT:-/tmp/execbench}
mkdir -p $OUT

run_one() { # $1=cpulist $2=chunk-spec $3=outfile
  if [ -n "$2" ]; then CHUNK_ENV="SPARK_GRAFT_CHUNK=$2"; else CHUNK_ENV=""; fi
  env $CHUNK_ENV taskset -c $1 java -cp "$CP" $JAVA_ARGS graft.Bench > $3 2>/dev/null
}

echo "== warm corpus (generate once) =="
run_one 0-31 "" $OUT/warm.json || true

echo "== single executor: 1x local[8] on cores 0-7, full corpus =="
t0=$(date +%s.%N)
run_one 0-7 "" $OUT/single.json
t1=$(date +%s.%N)
echo "single wall: $(awk "BEGIN{print $t1-$t0}")s"

echo "== 4 executors: 4x local[8], disjoint cores + chunk quarters =="
t0=$(date +%s.%N)
run_one 0-7   0/4 $OUT/e0.json &
run_one 8-15  1/4 $OUT/e1.json &
run_one 16-23 2/4 $OUT/e2.json &
run_one 24-31 3/4 $OUT/e3.json &
wait
t1=$(date +%s.%N)
echo "4-exec wall: $(awk -v a=$t0 -v b=$t1 'BEGIN{print b-a}')s"

python3 - "$OUT" <<'PYEOF'
import json, sys, glob
out = sys.argv[1]
def load(f):
    return json.loads(open(f).read().strip().splitlines()[-1])
single = load(f"{out}/single.json")
execs = [load(f) for f in sorted(glob.glob(f"{out}/e[0-3].json"))]
t1 = single['docs_per_sec']
# aggregate: total docs / slowest executor's extract wall
total_docs = sum(e['bench_docs'] for e in execs)
wall = max(e['extract_sec'] for e in execs)
t4 = total_docs / wall
print(f"1 executor : {t1:.1f} docs/s ({single['extract_sec']:.1f}s for {single['bench_docs']})")
for i, e in enumerate(execs):
    print(f"  exec {i}: {e['bench_docs']} docs in {e['extract_sec']:.1f}s")
print(f"4 executors: {t4:.1f} docs/s aggregate (slowest wall {wall:.1f}s)")
print(f"SCALE-OUT EFFICIENCY (N -> 4N executors): {(t4/t1)/4:.3f}")
PYEOF
