"""`serve` and `export-serving` commands — the production serving surface.

New capability (the reference has no serving layer, SURVEY.md §1): serve a
trained VisCoIN bundle over HTTP with fixed-shape jitted endpoints and
request micro-batching, or seal it into a ``jax.export`` AOT artifact that a
fleet can load without any model code.
"""

from __future__ import annotations

import click

from viscoin_tpu.cli.utils import device, viscoin_pickle_path


@click.command()
@viscoin_pickle_path
@device
@click.option("--host", default="127.0.0.1", show_default=True)
@click.option("--port", default=8751, show_default=True, type=int)
@click.option("--batch-size", default=8, show_default=True, type=int,
              help="Compiled device batch; requests coalesce up to it")
@click.option("--max-delay-ms", default=5.0, show_default=True, type=float,
              help="Micro-batching window: how long the first request of a "
                   "batch waits for company")
@click.option("--compute-dtype", default="bfloat16", show_default=True,
              type=click.Choice(["float32", "bfloat16"]),
              help="Serving compute dtype (weights cast once at startup)")
@click.option("--from-artifact", type=str, default=None,
              help="Serve a sealed export-serving artifact directory instead "
                   "of a checkpoint (no amplify — it needs model code)")
@click.option("--data-parallel/--no-data-parallel", default=False,
              help="Shard each device batch over all local devices "
                   "(1-D data mesh; batch-size must divide by device count)")
@click.pass_context
def serve(ctx, device, viscoin_pickle_path, host, port, batch_size,
          max_delay_ms, compute_dtype, from_artifact, data_parallel):
    """Serve a trained VisCoIN ensemble over HTTP.

    Endpoints: /healthz, /v1/stats, POST /v1/classify, /v1/reconstruct,
    /v1/amplify, /v1/explain (npz / JSON / raw-image bodies).
    """
    from viscoin_tpu.serve.server import run_server

    if from_artifact is not None:
        # An artifact is SEALED: its batch size, dtype, and device layout were
        # fixed at export time. Refuse explicitly-passed knobs instead of
        # silently serving with different values than the operator asked for.
        from click.core import ParameterSource

        sealed = [name for name in ("batch_size", "compute_dtype", "data_parallel")
                  if ctx.get_parameter_source(name) is not ParameterSource.DEFAULT]
        if sealed:
            flags = ", ".join("--" + n.replace("_", "-") for n in sealed)
            raise click.UsageError(
                f"{flags} cannot be combined with --from-artifact: the "
                "artifact's manifest fixes them at export time (re-export "
                "with the desired values)")

        from viscoin_tpu.serve.export import load_exported

        engine = load_exported(from_artifact)
        # The exported engine lacks amplify (it needs model code); the
        # classify/reconstruct/explain surface rides the same padded calls.
    else:
        from viscoin_tpu.serve.engine import InferenceEngine
        from viscoin_tpu.utils.checkpoints import load_viscoin_bundle

        import jax

        from viscoin_tpu.parallel.mesh import make_mesh

        mesh = make_mesh() if (data_parallel and len(jax.devices()) > 1) else None
        models = load_viscoin_bundle(viscoin_pickle_path)
        engine = InferenceEngine(models, batch_size=batch_size,
                                 compute_dtype=compute_dtype, mesh=mesh)
        print("warming up (compiling fixed-shape endpoints)...")
        engine.warmup()
    run_server(engine, host=host, port=port, max_delay_ms=max_delay_ms)


@click.command(name="export-serving")
@viscoin_pickle_path
@device
@click.option("--output", "-o", required=True, type=str,
              help="Artifact directory to write")
@click.option("--batch-size", default=8, show_default=True, type=int)
@click.option("--compute-dtype", default="bfloat16", show_default=True,
              type=click.Choice(["float32", "bfloat16"]))
@click.option("--platforms", default=None, type=str,
              help='Comma-separated lowering platforms, e.g. "tpu,cpu" '
                   "(default: current backend)")
def export_serving_cmd(device, viscoin_pickle_path, output, batch_size,
                       compute_dtype, platforms):
    """Seal a trained bundle into a jax.export serving artifact."""
    from viscoin_tpu.serve.export import export_serving
    from viscoin_tpu.utils.checkpoints import load_viscoin_bundle

    models = load_viscoin_bundle(viscoin_pickle_path)
    plats = tuple(platforms.split(",")) if platforms else None
    manifest = export_serving(models, output, batch_size=batch_size,
                              compute_dtype=compute_dtype, platforms=plats)
    print(f"exported {manifest['endpoints']} (batch {batch_size}, "
          f"{manifest['resolution']}px, {compute_dtype}) -> {output}")
