"""Scalar / array expression helpers.

Everything here returns Column expressions built from
``pyspark.sql.functions`` so the work stays JVM-side inside
whole-stage codegen — UDFs are the slow path and are quarantined in
``operators/multimodal.py`` and ``streaming/``.
"""
