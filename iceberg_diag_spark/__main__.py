from iceberg_diag_spark.cli import main

raise SystemExit(main())
