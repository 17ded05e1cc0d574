#!/bin/bash
# Scaling sweep: run graft.Bench at sf0.001 / sf0.01 / sf0.1 from one
# idle-box session (plain java — no sbt noise, identical JVM flags per
# point) and emit SCALING.md with per-query time ratios. A headline
# query whose sf0.01->sf0.1 ratio exceeds ~10x on a 10x corpus is
# super-linear and gets flagged for triage (e.g. an accidental O(n^2)
# pair blowup the small corpus is too small to expose).
set -eo pipefail
CP="/root/repo/target/scala-2.13/classes:/root/repo/src/main/resources:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# fourth point: the locally-synthesized sf1-equivalent (never touches
# /root/testdata — see scripts/synth_sf1.py's header for the remix rules)
if [ ! -f /tmp/testdata_sf1/lineitem.parquet ]; then
  echo "== synthesizing sf1 =="
  python3 /root/repo/scripts/synth_sf1.py /root/testdata/sf0.1 /tmp/testdata_sf1
fi
bench_one() {
  local NAME=$1 DIR=$2
  echo "== bench $NAME =="
  SPARK_GRAFT_SF_DIR=$DIR \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_$NAME.json \
  java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
    > /tmp/bench_$NAME.stdout 2>/tmp/bench_$NAME.stderr \
    || { echo "bench $NAME FAILED"; tail -20 /tmp/bench_$NAME.stderr; exit 1; }
  tail -1 /tmp/bench_$NAME.stdout
}
for SF in 0.001 0.01 0.1; do
  bench_one sf$SF /root/testdata/sf$SF
done
bench_one sf1 /tmp/testdata_sf1
# Optional fifth point for the media class-saturation claim (r18):
# SCALING_MEDIA_SF10=1 synthesizes a documents-only 10x remix of the
# synthetic sf1 and measures x_media_dedup_groups one more decade out
# (class counts via scripts/synth_sf10lite_docs.py + DuckDB). Runs
# BEFORE the report so its measured JSON feeds scaling_report.py
# (--media-sf10) instead of being hand-transcribed (r18 advice).
MEDIA_ARGS=()
if [ "${SCALING_MEDIA_SF10:-0}" = "1" ]; then
  [ -f /tmp/testdata_sf10lite/documents.parquet ] || \
    python3 /root/repo/scripts/synth_sf10lite_docs.py
  # reuse bench_one (FAILED marker + stderr tail on crash) — the media
  # point just adds the stage-skip and query filter via the environment
  export SPARK_GRAFT_STAGE=0 SPARK_GRAFT_ONLY=x_media_dedup_groups
  bench_one sf10lite_media /tmp/testdata_sf10lite
  unset SPARK_GRAFT_STAGE SPARK_GRAFT_ONLY
  MEDIA_ARGS=(--media-sf10 /tmp/bench_sf10lite_media.json)
fi
python3 /root/repo/scripts/scaling_report.py \
  /tmp/bench_sf0.001.json /tmp/bench_sf0.01.json /tmp/bench_sf0.1.json \
  /tmp/bench_sf1.json "${MEDIA_ARGS[@]}" \
  > /root/repo/SCALING.md
echo "wrote SCALING.md"
