from xetl_spark.cli import main

raise SystemExit(main())
