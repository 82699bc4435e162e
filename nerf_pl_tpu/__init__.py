"""nerf_pl_tpu — a TPU-native (JAX/XLA/Pallas/pjit) differentiable NeRF +
shadow-mapping framework with the capabilities of ktiwary2/nerf_pl.

Layout (see SURVEY.md for the reference layer map this mirrors):

- ``models``   : positional encoding, NeRF MLP (pure-pytree params), PPC camera math
- ``ops``      : ray generation, stratified/importance sampling (Pallas
                 ``searchsorted``), volume compositing, the three renderers,
                 shadow-mapping projection math
- ``data``     : Blender / LLFF / shadow-map dataset loaders producing host
                 numpy ray buffers (registry in ``data.__init__``)
- ``parallel`` : device-mesh construction, sharding helpers, distributed init
- ``training`` : losses, metrics, optimizers/schedules, checkpointing, logging,
                 and the trainer systems (one per reference ``train_*.py``)
- ``tools``    : eval (test-set render/gif/PSNR), colored-mesh extraction,
                 weights-only export
"""

__version__ = "0.1.0"
