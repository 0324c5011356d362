from vsr_tpu.cli import main

raise SystemExit(main())
