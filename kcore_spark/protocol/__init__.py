"""Kafka wire-protocol front-end (pure Python, outside Spark).

Covers the reference's implemented protocol surface — length-prefixed
framing and ApiVersions (API key 18) — plus Metadata served from the
TopicLog catalog. See SURVEY §2.1 (R1-R8) and §3 for the traced
reference lifecycle this mirrors.
"""
