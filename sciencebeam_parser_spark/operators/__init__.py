"""Dataflow operators re-expressing the reference's transforms (SURVEY §2A)
as DataFrame functions. Each module cites the reference behavior it matches.
"""
