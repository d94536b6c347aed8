"""Profile the north-star joint (--use_CNN) train step: where does the
step time go (CNN tower conv fusions vs embedding/energy ops)?

Run: cd /root/repo && nohup setsid python tools/profile_joint_step.py \
        > /tmp/profile_joint.log 2>&1 < /dev/null &
"""

import json
import os
import sys

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

if __name__ == "__main__":
    from __graft_entry__ import _ethec_labelmap
    from learning_embeddings_tpu.losses.joint_sampling import build_joint_graph
    from learning_embeddings_tpu.train.joint_cnn import (
        JointCNNConfig, JointCNNTrainer)
    from learning_embeddings_tpu.utils.profiling import (
        summarize_trace, trace_steps)

    labelmap = _ethec_labelmap()
    rng = np.random.RandomState(0)
    leaves = rng.randint(0, labelmap.levels[-1], 2048)
    ll = labelmap.leaf_paths()[leaves]
    graph, train_edges = build_joint_graph(labelmap, ll)
    img_edges = train_edges[train_edges[:, 1] >= labelmap.n_classes]
    bank = rng.rand(64, 448, 448, 3).astype(np.float32)

    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet50",
                         embedding_dim=10, image_size=448, batch_size=16,
                         neg_to_pos_ratio=5, alpha=0.05,
                         pick_per_level=True, seed=0)
    trainer = JointCNNTrainer(labelmap, graph, img_edges[:10000],
                              lambda rows: bank[np.asarray(rows) % 64], cfg)
    edges = img_edges[rng.permutation(len(img_edges))]
    prepared = [trainer.prepare_batch(edges[i * 16:(i + 1) * 16, 0],
                                      edges[i * 16:(i + 1) * 16, 1])
                for i in range(8)]
    # compile each bucket out of the trace
    for p in {p[0].shape[0]: p for p in prepared}.values():
        loss, _, _ = trainer.train_prepared(p)
        _ = float(loss)

    it = iter(prepared * 2)

    def one_step():
        loss, _, _ = trainer.train_prepared(next(it))
        return loss

    trace_steps(one_step, 6, "/tmp/joint_trace",
                sync=lambda out: float(out))
    for name, ms, share in summarize_trace("/tmp/joint_trace", 6)[:14]:
        print(json.dumps({"op": name, "ms_per_step": round(ms, 2),
                          "share": round(share, 3)}), flush=True)
    print("JOINT PROFILE DONE", flush=True)
