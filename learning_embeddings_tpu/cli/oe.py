"""Joint Euclidean order-embedding driver (counterpart of `network/oe.py`)."""

from ._joint_main import joint_main


def main(args=None):
    return joint_main(args, default_energy="order_emb_loss")


if __name__ == "__main__":
    main()
