"""learning_embeddings_tpu — TPU-native hierarchical image classification &
entailment-cone embedding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``ankitdhall/learning_embeddings`` (hierarchical image classification on the
ETHEC butterfly taxonomy using multi-head CNN classifiers and joint
image+label order-embedding / entailment-cone embeddings, Euclidean and
hyperbolic), redesigned TPU-first:

* label taxonomies are dense index arrays + boolean child masks (no Python
  dict walks in the hot path),
* the five hierarchical classification losses are masked matmuls / scans,
* pairwise entailment energies run as tiled Pallas kernels / single-matmul
  XLA formulations,
* Riemannian SGD on the Poincaré ball is an optax transform,
* data parallelism is `jax.sharding.Mesh` + `shard_map` with XLA collectives.

Subpackages
-----------
hierarchy  taxonomy core: labelmaps, hierarchy graphs, closures, splits
geometry   entailment energies, Poincaré-ball ops, pairwise kernels
data       ETHEC records, input pipeline, samplers
models     Flax backbones (ResNet et al.), heads, embedders
losses     classification + margin embedding losses
optim      optimizers incl. Riemannian SGD
parallel   mesh / sharding helpers
train      experiment runtimes (classifier, embedding, joint)
eval       metrics, threshold sweeps, reconstruction, reports
cli        entry points mirroring the reference drivers
"""

__version__ = "0.2.0"
