"""Scalar/column function library (text analytics, hashing, vectors).

Modules here expose *paired* builders: a PySpark ``Column`` expression and
the equivalent DuckDB SQL fragment generated from the same constant
tables, so every declared query's oracle is parity-by-construction.
"""
