"""Native (C++) ingest components. See build.py and ops/native.py."""
