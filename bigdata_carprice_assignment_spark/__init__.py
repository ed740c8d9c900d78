"""PySpark-native analytics engine re-expressing the capabilities of the
reference repo ``AbdoAhmed24/BigData_CarPrice_Assignment`` (an R analytics
pipeline) as lazy Spark DataFrame / Spark SQL / Spark ML plans, plus
large-scale LLM-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal plumbing).

Everything here is built from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
