"""Relational operators of the engine.

Most operator logic lives directly in the plan modules as DataFrame
compositions (the Spark-first design: operators ARE plans). This
package holds the pieces with real imperative surface: multimodal
decode plumbing (mapInPandas) and grouped-map UDF operators.
"""
