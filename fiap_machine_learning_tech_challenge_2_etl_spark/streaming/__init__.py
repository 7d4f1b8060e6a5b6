"""Structured Streaming incrementality (replaces the reference's S3->Lambda->Glue hop)."""
