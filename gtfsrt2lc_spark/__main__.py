"""``python -m gtfsrt2lc_spark`` — see cli.py (ref bin/gtfsrt2lc.js)."""

from gtfsrt2lc_spark.cli import main

raise SystemExit(main())
