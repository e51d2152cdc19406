from jsonschema_spark.cli import main

raise SystemExit(main())
