#!/bin/bash
# Run a graft main via plain java against a SNAPSHOT of the compiled
# classes — so sbt compiles/tests can keep running in the repo while a
# long Verify/ScaleUp/Bench job is live (incremental compile would
# otherwise swap class files under the running fork; CLAUDE.md).
# Usage: SPARK_GRAFT_CPUS=8 tools/runmain.sh <snapdir> <mainClass> [args...]
set -euo pipefail
SNAP="$1"; MAIN="$2"; shift 2
REPO="$(cd "$(dirname "$0")/.." && pwd)"
if [ ! -d "$SNAP/classes" ]; then
  mkdir -p "$SNAP"
  cp -r "$REPO/target/scala-2.13/classes" "$SNAP/classes"
  # `sbt compile` does NOT run copyResources — target/classes may lack
  # META-INF/services (the graft DataSourceRegister) right after a fresh
  # compile. Overlay the source resources so format("graft") always
  # resolves from the snapshot.
  cp -r "$REPO/src/main/resources/." "$SNAP/classes/"
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SCALA_LIB="$(ls "$HOME"/.cache/coursier/v1/https/*/maven2/org/scala-lang/scala-library/2.13.17/scala-library-2.13.17.jar 2>/dev/null | head -1 || true)"
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" ${SPARK_EXTRA_JAVA_OPTS:-} \
  -cp "$SNAP/classes:$SCALA_LIB:/opt/spark/jars/*" "$MAIN" "$@"
