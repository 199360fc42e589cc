from gpz_tpu.cli import main

raise SystemExit(main())
