"""Spark operators for the KG-construction pipeline.

Each module pairs a pure-Python/pandas core (unit-testable without a
SparkSession) with a thin Spark lift (pandas UDF / mapInPandas /
DataFrame composition). Hot paths are Arrow-batched; nothing iterates
rows in Python.
"""
