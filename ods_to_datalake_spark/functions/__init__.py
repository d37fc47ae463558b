"""Column-level function library (SURVEY §2.7) — pure Catalyst expressions.

Policy per SURVEY §2.9: the reference defines zero UDFs; every computation is
built-in expressions. We keep that: everything in this package composes
`pyspark.sql.functions` so it stays inside WholeStageCodegen.
"""
