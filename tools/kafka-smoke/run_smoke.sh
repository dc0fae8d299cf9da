#!/usr/bin/env bash
# Live-broker smoke for sources/kafka.py — run AFTER `docker compose up -d`
# in this directory (or point KAFKA_BOOTSTRAP at any reachable broker).
#
# What it proves (tests/test_kafka_integration.py): produce raw weather
# JSON to a real input topic, run the canonical stateful rollup topology
# over a format("kafka") stream read, write the engine's exact wire
# bytes to an output topic, batch-read them back, and assert the golden
# day-1 average — the full S1/S2/S3 surface against live Kafka instead
# of the file seam.
#
# The spark-sql-kafka connector jar is not bundled with pyspark; this
# script resolves it (and its kafka-clients/commons-pool2 deps) through
# Spark's own --packages machinery via PYSPARK_SUBMIT_ARGS, so the only
# host requirements are Docker, Java 17, and network access to Maven
# Central the first time.
set -euo pipefail

BOOTSTRAP="${KAFKA_BOOTSTRAP:-localhost:9092}"
SPARK_VERSION="$(python -c 'import pyspark; print(pyspark.__version__)')"
# Scala ABI must match the installed pyspark wheel: Spark 4.x ships
# Scala 2.13 only; pip Spark 3.x wheels are built against 2.12 — a
# mismatched connector dies in NoSuchMethodError, not a clear message
case "${SPARK_VERSION}" in
  4.*) SCALA_SUFFIX="2.13" ;;
  3.*) SCALA_SUFFIX="2.12" ;;
  *) echo "unsupported pyspark version ${SPARK_VERSION}" >&2; exit 1 ;;
esac

echo "pyspark ${SPARK_VERSION} (scala ${SCALA_SUFFIX}); broker ${BOOTSTRAP}"

export PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_${SCALA_SUFFIX}:${SPARK_VERSION} pyspark-shell"
export KAFKA_BOOTSTRAP="${BOOTSTRAP}"

cd "$(dirname "$0")/../.."
exec python -m pytest tests/test_kafka_integration.py -v -rs
