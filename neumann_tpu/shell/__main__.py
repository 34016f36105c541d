from neumann_tpu.shell.shell import main

raise SystemExit(main())
