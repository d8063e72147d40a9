from firebase_realtime_database_backup_spark.api import main

raise SystemExit(main())
