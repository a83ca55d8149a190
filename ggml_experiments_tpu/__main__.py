from ggml_experiments_tpu.cli import main

raise SystemExit(main())
