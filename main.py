"""CLI entrypoint (reference: main.py — same 8 subcommands).

Example usage:
```bash
python main.py train classifier --dataset cub --batch-size 32
python main.py amplify --concept-threshold 0.2
```
"""

import click

from viscoin_tpu.cli.amplify import amplify
from viscoin_tpu.cli.amplify_pca import amplify_pca
from viscoin_tpu.cli.concept_heatmaps import concept_heatmaps
from viscoin_tpu.cli.concepts import concepts
from viscoin_tpu.cli.logs import logs
from viscoin_tpu.cli.test import test
from viscoin_tpu.cli.to_pickle import to_pickle
from viscoin_tpu.cli.train import train

# Optional Trogon TUI, like the reference (main.py:23-32)
try:
    from trogon import tui
except ImportError:

    def tui():
        return lambda f: f


@tui()
@click.group(context_settings={"max_content_width": 1000})
def main():
    pass


main.add_command(train)
main.add_command(test)
main.add_command(to_pickle)
main.add_command(amplify)
main.add_command(concepts)
main.add_command(concept_heatmaps)
main.add_command(logs)
main.add_command(amplify_pca)


if __name__ == "__main__":
    main()
