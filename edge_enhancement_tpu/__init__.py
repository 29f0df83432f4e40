"""edge_enhancement_tpu — a TPU-native (JAX/XLA/Pallas) framework for
edge-enhancement adversarial-robustness training.

Re-designed from scratch for TPU with the capability surface of the
Edge-Enhancement reference (see SURVEY.md): differentiable edge/defense ops
(high-frequency suppression, Canny variants with straight-through-estimator
gradients, square-perturbation augmentation), CNN model zoos (MNIST CNN,
ResNet / PreActResNet / feature-denoising ResNet, U2-Net), a menu of
adversarial-training objectives (ST/AT/targeted-AT/ALP/TRADES/AVmixup/AWP/
free/fast), attack batteries (PGD/FGSM/CW/AutoAttack-lite), and data-parallel
training over a `jax.sharding.Mesh`.

Everything in the compute path is functional and jit-compatible: attacks are
`lax.fori_loop`s differentiating through the model with `jax.grad`, training
steps fuse the attack inner loop with the parameter update, and data
parallelism is expressed with sharding annotations (XLA inserts the
collectives — the SyncBatchNorm/DDP/NCCL machinery of the reference collapses
into mesh + shardings).
"""

__version__ = "0.1.0"
