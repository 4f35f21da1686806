"""``python -m csv2db_spark`` — the reference's CLI surface (main.go)."""

from csv2db_spark.cli import main

raise SystemExit(main())
