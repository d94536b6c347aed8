"""Joint hyperbolic entailment-cone driver — the flagship workload
(counterpart of `network/oe_h.py`)."""

from ._joint_main import joint_main


def main(args=None):
    return joint_main(args, default_energy="hyp_cones_loss")


if __name__ == "__main__":
    main()
