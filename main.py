"""Entry point: ``python main.py --config config.yaml [flags]``.

Same CLI surface as the reference (``main.py:233-260``); implementation in
``rtsds_tpu/cli.py``.
"""

from rtsds_tpu.cli import main

if __name__ == "__main__":
    main()
