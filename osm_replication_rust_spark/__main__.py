"""`python -m osm_replication_rust_spark` — see cli.py."""

import sys

from .cli import main

sys.exit(main())
