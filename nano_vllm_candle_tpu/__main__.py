import sys

from nano_vllm_candle_tpu.cli import main

sys.exit(main())
