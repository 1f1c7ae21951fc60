"""incr_iter_hadoop_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
``subratag/incr-iter-hadoop`` (an incremental/iterative MapReduce fork of
Hadoop 1.0.2) on idiomatic PySpark:

- ``sources``    : scans/sinks (S1-S11 in SURVEY.md §2.1)
- ``functions``  : scalar/vector/text column expressions (P1-P10, §2.2)
- ``operators``  : relational battery, joins, aggregates, windows, set ops,
                   iterative algorithms, incremental view maintenance, and
                   the LLM-data-pipeline surface (dedup / similarity /
                   text analysis / multimodal)
- ``plans``      : the iterate-to-convergence loop driver (I1-I5, I9)
- ``streaming``  : Structured Streaming expression of incremental refresh

Everything is DataFrame-first: Catalyst/Tungsten pick physical strategy;
custom code exists only where the reference has semantics Spark lacks
(the loop driver and the delta-refresh planner).
"""

__version__ = "0.1.0"
