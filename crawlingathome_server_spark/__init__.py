"""PySpark-native URL-frontier + fetch scheduler with the query and
data-processing semantics of TheoCoombes/crawlingathome-server, rebuilt
Spark-first (SURVEY.md). Not a port: the reference's request/response +
row-lock loop is inverted into deterministic round-based DataFrame jobs.
"""

__version__ = "0.1.0"
