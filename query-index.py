#!/usr/bin/env python3
"""Query REPL entry point — the reference CLI contract:

    python query-index.py

See clipx/cli/query_index.py for the implementation and the command set
(``h`` inside the REPL prints help).
"""
import sys

from clipx.cli.query_index import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
