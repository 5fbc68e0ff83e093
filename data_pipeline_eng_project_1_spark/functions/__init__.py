"""Scalar/array function library (native column algebra, no Python UDFs)."""
