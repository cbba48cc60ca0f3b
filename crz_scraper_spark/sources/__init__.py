"""Scans & sinks (SURVEY.md §2.1): XML dumps with corrupt-record routing,
pipe-delimited CSV, directory-tree text corpora, binary files."""
