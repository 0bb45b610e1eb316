#!/usr/bin/env python3
"""Indexer entry point — the reference CLI contract:

    python build-index.py FOLDER1/ FOLDER2/ ...

(folders scanned non-recursively; pass trailing slashes — paths are
joined by concatenation exactly like reference:build-index.py:31).
See clipx/cli/build_index.py for the implementation.
"""
import sys

from clipx.cli.build_index import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
