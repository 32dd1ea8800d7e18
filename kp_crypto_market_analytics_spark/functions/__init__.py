"""Scalar / column-expression function library (SURVEY.md §2.3).

Everything here is a pure Catalyst expression builder — JVM-side,
whole-stage-codegen friendly, zero Python UDFs.
"""
