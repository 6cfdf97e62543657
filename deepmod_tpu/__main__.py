from deepmod_tpu.cli import main

raise SystemExit(main())
