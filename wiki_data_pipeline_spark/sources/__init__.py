"""Custom Spark data sources (Python Data Source API).

The reference's hand-rolled source machinery — paginated enumeration
with a continuation cursor (S1, src/mediawiki_client.py:66-112), blob
listing with prefix filter (S9, src/azure_manager.py:107-114), and
per-blob JSON parse (S8, src/azure_manager.py:127-136) — re-expressed
as a first-class Spark connector: partition-planned, filter-pushing,
schema-projecting.
"""
