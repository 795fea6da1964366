"""Training-data operators for 100 TB-scale pipelines.

Each operator is a Ray-Data-first batch transform over the synthetic
TPC-H-ish test tables (documents, embeddings, events, lineitem):
vectorized kernels inside `map_batches`, partial pre-aggregation before
any `groupby`, broadcast lookups instead of shuffle joins. The
`registry` module wires them into the driver's queries()/oracle_sql().
"""
