"""Batch operator library.

Each module mirrors a section of SURVEY.md §2 and maps it onto the
driver test tables (`events` plays the role of the live-activity /
metric feed, TPC-H tables play the relational catalog, `documents` /
`embeddings` carry the training-data-pipeline operators).
"""
