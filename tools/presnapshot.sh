#!/usr/bin/env bash
# Pre-snapshot gate: refuse any end-of-round commit unless the build compiles
# AND the flagship entry query returns rows. Two of the first four rounds
# committed uncompiling code at round end, zeroing the official gates — this
# script makes the "never snapshot without a green compile + smoke" rule
# mechanical. Usage: tools/presnapshot.sh  (exit 0 = safe to commit)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[presnapshot] sbt compile + Test/compile..."
sbt -batch compile Test/compile

echo "[presnapshot] smoke: SparkEntry.entry on sf0.001..."
cat > /tmp/presnapshot_smoke.scala <<'EOF'
object PresnapshotSmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tuned(
      org.apache.spark.sql.SparkSession.builder()
        .master("local[4]").appName("presnapshot-smoke"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    require(n > 0, s"entry query returned $n rows")
    println(s"[presnapshot] OK: entry returned $n rows")
    spark.stop()
  }
}
EOF
CP="$(ls -d /opt/spark/jars | head -1)/*:target/scala-2.13/classes"
scalac -classpath "$CP" -d /tmp/presnapshot_classes /tmp/presnapshot_smoke.scala
java --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
     --add-opens java.base/java.nio=ALL-UNNAMED \
     --add-opens java.base/java.util=ALL-UNNAMED \
     --add-opens java.base/java.lang=ALL-UNNAMED \
     --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
     --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
     --add-opens java.security.jgss/sun.security.krb5=ALL-UNNAMED \
     -cp "/opt/spark/jars/*:target/scala-2.13/classes:/tmp/presnapshot_classes" \
     PresnapshotSmoke
echo "[presnapshot] PASS — safe to commit"
