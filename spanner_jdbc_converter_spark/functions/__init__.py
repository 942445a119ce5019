"""Column-expression helpers: vector math, text analysis, portable hashing.

Everything here returns Catalyst Column expressions built from
pyspark.sql.functions — JVM-side, codegen'd, no Python in the hot path.
"""
