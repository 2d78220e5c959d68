"""``python -m geomesa_spark`` — the geomesa-tools CLI (see cli.py)."""

from .cli import main

raise SystemExit(main())
