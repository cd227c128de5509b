from gfx_ocean_tpu.cli import main

raise SystemExit(main())
