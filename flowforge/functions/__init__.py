"""Scalar/column function surface: reference-parity normalize/enrich
expressions plus training-data-pipeline text/dedup/similarity operators.
All pure Spark Column expressions or vectorized pandas/Arrow UDFs.
"""
