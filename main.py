"""CLI entrypoint (reference: main.py — same 8 subcommands).

Example usage:
```bash
python main.py train classifier --dataset cub --batch-size 32
python main.py amplify --concept-threshold 0.2
```
"""

import os

import click
import jax

# Persistent compile cache for every CLI run: remote (relay) compiles take
# minutes; cached reloads take seconds. Same location bench.py uses.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 os.path.expanduser("~/.cache/jax_comp_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from viscoin_tpu.cli.amplify import amplify  # noqa: E402
from viscoin_tpu.cli.amplify_pca import amplify_pca  # noqa: E402
from viscoin_tpu.cli.concept_heatmaps import concept_heatmaps  # noqa: E402
from viscoin_tpu.cli.concepts import concepts  # noqa: E402
from viscoin_tpu.cli.dataset_tool import dataset_tool  # noqa: E402
from viscoin_tpu.cli.fid import fid  # noqa: E402
from viscoin_tpu.cli.generate import generate  # noqa: E402
from viscoin_tpu.cli.logs import logs  # noqa: E402
from viscoin_tpu.cli.prewarm import prewarm  # noqa: E402
from viscoin_tpu.cli.project import project  # noqa: E402
from viscoin_tpu.cli.serve import export_serving_cmd, serve  # noqa: E402
from viscoin_tpu.cli.style_mixing import style_mixing  # noqa: E402
from viscoin_tpu.cli.test import test  # noqa: E402
from viscoin_tpu.cli.to_pickle import to_pickle  # noqa: E402
from viscoin_tpu.cli.train import train  # noqa: E402

# Optional Trogon TUI, like the reference (main.py:23-32)
try:
    from trogon import tui  # noqa: E402
except ImportError:

    def tui():
        return lambda f: f


@tui()
@click.group(context_settings={"max_content_width": 1000})
def main():
    pass


main.add_command(train)
main.add_command(prewarm)
main.add_command(test)
main.add_command(to_pickle)
main.add_command(amplify)
main.add_command(concepts)
main.add_command(concept_heatmaps)
main.add_command(logs)
main.add_command(amplify_pca)
main.add_command(dataset_tool)
main.add_command(serve)
main.add_command(export_serving_cmd)
main.add_command(fid)
main.add_command(generate)
main.add_command(project)
main.add_command(style_mixing)


if __name__ == "__main__":
    main()
