"""Jar-free Kafka source throughput probe (scale-story evidence).

Measures the pure-Python wire-protocol path end to end against the
in-process broker: produce N messages across P partitions, then batch-
read them through ``format("kafka_py")`` and aggregate.  Loopback TCP,
so the numbers bound the PYTHON+PROTOCOL overhead, not network — the
relevant question for cluster use, where each of P fetch tasks opens
its own broker connection and the wire time is network-bound anyway.

Also asserts the fan-out contract: the scan runs exactly P Spark
tasks (one InputPartition per Kafka partition), which is what makes a
1000-partition topic parallelize across 1000 executor slots.

    python scripts/kafka_probe.py [N_MSGS] [N_PARTITIONS] [PAYLOAD_B]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from dask_cudf_spark.session import get_spark  # noqa: E402
from dask_cudf_spark.streaming.kafka_protocol import (  # noqa: E402
    InProcBroker,
    KafkaClient,
)
from dask_cudf_spark.streaming.kafka_source import (  # noqa: E402
    register_kafka_source,
)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    payload_b = int(sys.argv[3]) if len(sys.argv) > 3 else 96

    spark = get_spark(app_name="kafka-probe")
    register_kafka_source(spark)

    with InProcBroker(num_partitions=parts) as broker:
        pad = "x" * max(0, payload_b - 20)
        per = n // parts
        t0 = time.time()
        with KafkaClient(broker.bootstrap) as cli:
            for pid in range(parts):
                cli.produce(
                    "tp",
                    pid,
                    [
                        (None, f"{pid * per + i}|{pad}".encode())
                        for i in range(per)
                    ],
                    1_700_000_000_000,
                )
        t_produce = time.time() - t0

        reader = (
            spark.read.format("kafka_py")
            .option("bootstrap", broker.bootstrap)
            .option("subscribe", "tp")
        )
        # warm the JVM/Python-worker path once, then measure
        reader.load().selectExpr("count(*)").collect()
        t0 = time.time()
        row = (
            reader.load()
            .select(
                F.split(F.col("value").cast("string"), r"\|")
                .getItem(0)
                .cast("long")
                .alias("seq")
            )
            .agg(
                F.count("*").alias("n"),
                F.sum("seq").alias("s"),
                F.countDistinct("seq").alias("d"),
            )
            .first()
        )
        t_consume = time.time() - t0
        total = per * parts
        assert row.n == total and row.d == total
        assert row.s == total * (total - 1) // 2  # every seq exactly once

        # fan-out contract: one Spark task per Kafka partition
        n_parts = reader.load().rdd.getNumPartitions()
        assert n_parts == parts, f"expected {parts} scan partitions, got {n_parts}"

        mb = total * payload_b / 1e6
        print(
            json.dumps(
                {
                    "msgs": total,
                    "partitions": parts,
                    "payload_b": payload_b,
                    "produce_s": round(t_produce, 2),
                    "produce_msgs_per_s": int(total / t_produce),
                    "consume_s": round(t_consume, 2),
                    "consume_msgs_per_s": int(total / t_consume),
                    "consume_mb_per_s": round(mb / t_consume, 1),
                    "scan_tasks": n_parts,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
