"""Large-scale training-data pipeline operators (beyond the reference's
surface): dedup, similarity search, text analysis, multimodal columns.

Design contract shared with ``operators/``: DataFrame in → DataFrame out,
no driver-side collect, no per-row external calls, broadcast or shuffle
joins only — every op must survive a 1000-executor / 100 TB deployment.
"""
