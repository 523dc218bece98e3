from sfm_tpu.cli import main

raise SystemExit(main())
