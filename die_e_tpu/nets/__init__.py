from die_e_tpu.nets.resnet import PolicyValueNet, init_params, make_net

__all__ = ["PolicyValueNet", "init_params", "make_net"]
