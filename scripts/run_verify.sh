#!/bin/bash
# Run graft.Verify directly with java (faster than sbt) then compare with DuckDB.
set -eo pipefail
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_verify}
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
rm -rf "$OUT"
java $OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Verify "$SF" "$OUT" > /tmp/graft_verify_java.log 2>&1 \
  || { echo "graft.Verify FAILED (exit $?)"; tail -30 /tmp/graft_verify_java.log; exit 1; }
grep '\[verify\]' /tmp/graft_verify_java.log || true
python3 /root/repo/scripts/verify_local.py "$SF" "$OUT"
