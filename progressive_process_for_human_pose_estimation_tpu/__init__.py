"""TPU-native progressive stacked-hourglass pose-estimation framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
``Xinjie-Qiu/progressive_process_for_human_pose_estimation`` (see SURVEY.md):

- ``ops``      — NHWC flax modules: residual blocks (all reference variants),
                 ASPP, hourglass encoders/decoders, torch-parity resize ops.
- ``models``   — the model zoo: ProgressiveHourglass (reference train.py),
                 ClassicHourglass baseline (hourglass_compare.py), recursive
                 weight-shared StackedHourglass (only_one_hourgless.py,
                 try_with_torch.py), MaskNet, RefinerD.
- ``targets``  — on-device label rendering: Gaussian heatmaps and PIL-parity
                 point/ellipse/line/polygon class-map rasterization.
- ``augment``  — geometric + photometric augmentation as explicit-PRNG,
                 jit-compatible transforms.
- ``losses``   — the full reference loss family (MSE/CE per stack, OHEM
                 top-k CE/MSE with annealed fractions, masked variants).
- ``data``     — manifest builders (LSP/MPII/COCO) + host pipeline.
- ``train``    — train state/step, pjit/shard_map data parallelism,
                 checkpointing with shape-filtered fine-tune restore.
- ``eval``     — on-device PCKh curves and heatmap decoding.
- ``parallel`` — mesh/sharding helpers.
- ``bench``    — throughput/latency/FLOP harnesses.

Recommended import alias::

    import progressive_process_for_human_pose_estimation_tpu as pphpe
"""

__version__ = "0.1.0"
