"""``python -m zpack_tpu`` → the zpack CLI."""

from .cli.main import main

raise SystemExit(main())
