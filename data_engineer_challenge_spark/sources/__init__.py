"""Sources (SURVEY.md §2.1): patient-registry XLSX, binary clinical
documents (PDF/DOCX), and the parquet star schema (``tables.py``)."""
