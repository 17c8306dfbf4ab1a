"""Operator library: relational, dedup, similarity, text, topic-log ops.

Everything here is expressed with the DataFrame API (Catalyst-optimizable)
unless a docstring explicitly marks the Pandas-UDF slow path.
"""
