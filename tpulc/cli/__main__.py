from tpulc.cli.main import main

raise SystemExit(main())
