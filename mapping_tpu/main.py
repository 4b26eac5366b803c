"""CLI: the reference's main.py command surface (main.py:12-64).

Commands: prepare_masks, prepare_metadata, train, evaluate, predict_on_dir,
train_evaluate, with flags -p/--pipeline_name, -d/--dev_mode,
-c/--chunk_size, --dir_path, --prediction_path. Config comes from
$CONFIG_PATH or --config. Beyond the reference surface: `serve` starts the
online HTTP serving daemon (infer/daemon.py); `export` writes the fused
serving program as an AOT jax.export artifact (infer/artifact.py).

    python -m mapping_tpu.main train -p unet_weighted -d
"""

import json

import click

from mapping_tpu.manager import PipelineManager


@click.group()
@click.option("--config", "config_path", default=None,
              help="yaml parameter file (defaults to $CONFIG_PATH)")
@click.pass_context
def main(ctx, config_path):
    ctx.obj = PipelineManager(config_path)


@main.command(name="prepare_masks")
@click.option("-d", "--dev_mode", is_flag=True)
@click.pass_obj
def prepare_masks(manager, dev_mode):
    manager.prepare_masks(dev_mode)


@main.command(name="prepare_metadata")
@click.option("-tr", "--train_data", is_flag=True)
@click.option("-val", "--valid_data", is_flag=True)
@click.pass_obj
def prepare_metadata(manager, train_data, valid_data):
    if not (train_data or valid_data):
        train_data = valid_data = True
    manager.prepare_metadata(train_data, valid_data)


@main.command(name="train")
@click.option("-p", "--pipeline_name", default="unet_weighted")
@click.option("-d", "--dev_mode", is_flag=True)
@click.option("-w", "--warm_start", is_flag=True,
              help="continue training from the cached transformer under the "
                   "current yaml (stage 2+ of the multistage recipe); the "
                   "completed previous stage is archived, not overwritten")
@click.pass_obj
def train(manager, pipeline_name, dev_mode, warm_start):
    manager.start_experiment()
    manager.train(pipeline_name, dev_mode, warm_start=warm_start)
    manager.finish_experiment()


@main.command(name="evaluate")
@click.option("-p", "--pipeline_name", default="unet")
@click.option("-d", "--dev_mode", is_flag=True)
@click.option("-c", "--chunk_size", type=int, default=None)
@click.option("--artifact", "artifact_dir", default=None,
              help="score an exported AOT artifact on the validation "
                   "sample (deployment acceptance check; no checkpoint "
                   "or model code needed)")
@click.pass_obj
def evaluate(manager, pipeline_name, dev_mode, chunk_size, artifact_dir):
    manager.start_experiment()
    if artifact_dir:
        manager.evaluate_artifact(artifact_dir, dev_mode, chunk_size)
    else:
        manager.evaluate(pipeline_name, dev_mode, chunk_size)
    manager.finish_experiment()


@main.command(name="predict_on_dir")
@click.option("-p", "--pipeline_name", default="unet")
@click.option("--dir_path", required=True)
@click.option("--prediction_path", required=True)
@click.option("-c", "--chunk_size", type=int, default=None)
@click.option("--artifact", "artifact_dir", default=None,
              help="predict with an exported AOT artifact directory "
                   "instead of a pipeline (no checkpoint/model code needed)")
@click.pass_obj
def predict_on_dir(manager, pipeline_name, dir_path, prediction_path,
                   chunk_size, artifact_dir):
    if artifact_dir:
        from mapping_tpu.infer.artifact import predict_dir_with_artifact

        predict_dir_with_artifact(
            artifact_dir, dir_path, prediction_path,
            chunk_images=chunk_size or 0,
            data_parallel=bool(manager.params.get("data_parallel", 0)))
        return
    manager.start_experiment()
    manager.predict_on_dir(pipeline_name, dir_path, prediction_path,
                           chunk_size)
    manager.finish_experiment()


@main.command(name="serve")
@click.option("-p", "--pipeline_name", default="unet")
@click.option("--artifact", "artifact_dir", default=None,
              help="serve an exported AOT artifact directory instead of a "
                   "pipeline (no checkpoint/model code needed)")
@click.option("--host", default="127.0.0.1")
@click.option("--port", type=int, default=8000)
@click.option("--max_wait_ms", type=float, default=5.0,
              help="microbatch coalescing window after the first request")
@click.option("--max_pending", type=int, default=None,
              help="backpressure: queued-request cap before 429 "
                   "load-shedding (default 8x batch; pipeline mode also "
                   "honors serve_max_pending from the config)")
@click.pass_obj
def serve(manager, pipeline_name, artifact_dir, host, port, max_wait_ms,
          max_pending):
    """Online serving: microbatched fused inference over HTTP
    (POST /v1/predict with JPEG/PNG/.npy bytes -> COCO annotations)."""
    if artifact_dir:
        from mapping_tpu.infer.daemon import daemon_from_artifact

        daemon = daemon_from_artifact(artifact_dir, host=host, port=port,
                                      max_wait_ms=max_wait_ms,
                                      max_pending=max_pending)
    else:
        from mapping_tpu.infer.daemon import daemon_from_pipeline
        from mapping_tpu.pipelines import PIPELINES

        pipeline = PIPELINES[pipeline_name]["inference"](manager.config)
        daemon = daemon_from_pipeline(pipeline, manager.config, host=host,
                                      port=port, max_wait_ms=max_wait_ms,
                                      max_pending=max_pending)
    daemon.serve_forever()


@main.command(name="export")
@click.option("-p", "--pipeline_name", default="unet")
@click.option("--dir_path", required=True,
              help="output directory for the serving artifact")
@click.option("--platforms", default=None,
              help="comma-separated lowering targets (e.g. 'tpu,cpu'); "
                   "default = the current backend")
@click.pass_obj
def export_cmd(manager, pipeline_name, dir_path, platforms):
    """Export the fused serving program as an AOT artifact
    (jax.export StableHLO + weights + manifest — servable via
    infer.artifact.load_artifact with no model code or checkpoint)."""
    from mapping_tpu.infer.artifact import export_serving_artifact
    from mapping_tpu.pipelines import PIPELINES

    pipeline = PIPELINES[pipeline_name]["inference"](manager.config)
    plats = ([p.strip() for p in platforms.split(",") if p.strip()]
             if platforms else None)
    manifest = export_serving_artifact(pipeline, manager.config, dir_path,
                                       platforms=plats)
    click.echo(json.dumps(manifest, indent=1))


@main.command(name="visualize")
@click.option("--prediction_path", required=True,
              help="a COCO results json (what evaluate/predict_on_dir write)")
@click.option("--out_dir", required=True)
@click.option("-n", "--n_images", type=int, default=8)
@click.option("--dataset", default="val",
              help="GT split under data_dir (annotation.json + images/)")
@click.option("--score_threshold", type=float, default=0.0)
@click.option("--max_dets", type=int, default=100,
              help="draw at most the top-K detections per image by score "
                   "(the eval maxDets protocol); 0 = unlimited")
@click.option("--hide_suppressed/--show_suppressed", default=True,
              help="hide score==0.0 instances (NMS-suppressed markers in "
                   "scoring-pipeline jsons written with emit_suppressed: 1); "
                   "--show_suppressed draws legitimate zero-score "
                   "detections from other producers")
@click.pass_obj
def visualize(manager, prediction_path, out_dir, n_images, dataset,
              score_threshold, max_dets, hide_suppressed):
    """GT-vs-prediction overlay PNGs for sampled images — the reference's
    results_exploration notebook as a product command."""
    from mapping_tpu.utils.visualize import visualize_predictions

    written = visualize_predictions(
        prediction_path, manager.params.data_dir, out_dir,
        dataset=dataset, n_images=n_images, score_threshold=score_threshold,
        max_dets=max_dets, hide_suppressed=hide_suppressed)
    click.echo(json.dumps({"written": written}))


@main.command(name="import_checkpoint")
@click.option("-p", "--pipeline_name", default="unet")
@click.option("--path", "checkpoint_path", required=True,
              help="complete torch UNet state_dict (.pth/.pt/.npz; plain, "
                   "{'state_dict': ...}-wrapped or 'module.'-prefixed)")
@click.pass_obj
def import_checkpoint(manager, pipeline_name, checkpoint_path):
    """Import a reference trained checkpoint into the experiment's
    transformer cache; evaluate/predict_on_dir/serve/export then run the
    imported weights directly."""
    manager.start_experiment()
    manager.import_checkpoint(checkpoint_path, pipeline_name)
    manager.finish_experiment()


@main.command(name="parity_drill")
@click.option("-p", "--pipeline_name", default="unet")
@click.option("--checkpoint", "checkpoint_path", default=None,
              envvar="CHECKPOINT",
              help="reference trained checkpoint (torch state_dict); "
                   "defaults to $CHECKPOINT")
@click.option("--data_dir", default=None, envvar="DATA_DIR",
              help="CrowdAI dataset root (train/ + val/ with "
                   "annotation.json); defaults to $DATA_DIR, else the "
                   "config's data_dir")
@click.option("-c", "--chunk_size", type=int, default=None)
@click.option("-d", "--dev_mode", is_flag=True)
@click.pass_obj
def parity_drill(manager, pipeline_name, checkpoint_path, data_dir,
                 chunk_size, dev_mode):
    """One-command real-data parity check vs the reference's published
    AP 0.943 / AR 0.954 (reference README.md:21-29): import the trained
    checkpoint, run prepare_metadata if needed, evaluate, print the delta.
    The day the CrowdAI data + checkpoint land, parity is

        DATA_DIR=... CHECKPOINT=... python -m mapping_tpu.main parity_drill
    """
    from mapping_tpu.manager import parity_drill as run_drill

    if not checkpoint_path:
        raise click.UsageError(
            "no checkpoint: pass --checkpoint or set $CHECKPOINT")
    report = run_drill(manager, pipeline_name, checkpoint_path,
                       data_dir=data_dir, chunk_size=chunk_size,
                       dev_mode=dev_mode)
    click.echo(json.dumps(report, indent=1))


@main.command(name="train_evaluate")
@click.option("-p", "--pipeline_name", default="unet_weighted")
@click.option("-d", "--dev_mode", is_flag=True)
@click.option("-c", "--chunk_size", type=int, default=None)
@click.option("-w", "--warm_start", is_flag=True,
              help="continue training from the cached transformer under the "
                   "current yaml (stage 2+ of the multistage recipe)")
@click.pass_obj
def train_evaluate(manager, pipeline_name, dev_mode, chunk_size, warm_start):
    manager.start_experiment()
    manager.train(pipeline_name, dev_mode, warm_start=warm_start)
    manager.evaluate(pipeline_name, dev_mode, chunk_size)
    manager.finish_experiment()


if __name__ == "__main__":
    main()
