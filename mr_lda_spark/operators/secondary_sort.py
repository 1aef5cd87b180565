"""Secondary-sort streaming reduce (SURVEY.md §2.5 O4).

The reference's TermReducer depends on MapReduce's secondary sort:
reduce input arrives ordered by (topic, term) and the reducer detects
group changes in a single streaming pass (TermReducer.java:169-215).
The engine normally replaces this with relational aggregation, but the
pattern itself is expressible in Spark when single-pass/streaming
semantics are genuinely needed: ``repartition(key)`` +
``sortWithinPartitions(key, sort)`` + an Arrow-batched per-partition
pass that sees each group's rows contiguously and in order.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame


def streaming_group_reduce(
    df: DataFrame,
    partition_key: str,
    sort_key: str,
    reduce_group: Callable[[object, pd.DataFrame], dict],
    out_schema: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Run ``reduce_group(key, group_rows)`` once per partition-key
    group, with groups arriving whole and internally ordered by
    ``sort_key`` — the MapReduce reduce() contract.

    The sort guarantee holds because hash-partitioning puts every row
    of a key in one partition and the partition-local sort orders them;
    ``mapInPandas`` then walks each partition start to end.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    arranged = df.repartition(n, partition_key).sortWithinPartitions(
        partition_key, sort_key
    )

    def run(batches):
        current_key = None
        buffer: list = []

        def flush():
            if current_key is None or not buffer:
                return None
            group = pd.concat(buffer, ignore_index=True)
            return reduce_group(current_key, group)

        results = []
        for pdf in batches:
            for key, grp in pdf.groupby(partition_key, sort=False):
                if key != current_key:
                    out = flush()
                    if out is not None:
                        results.append(out)
                    current_key = key
                    buffer = [grp]
                else:
                    buffer.append(grp)
        out = flush()
        if out is not None:
            results.append(out)
        if results:
            yield pd.DataFrame(results)

    return arranged.mapInPandas(run, schema=out_schema)
