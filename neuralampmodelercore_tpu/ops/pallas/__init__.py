"""Fused Pallas kernel backends, keyed by model config type."""


def backend_for(cfg):
    """The pallas kernel module serving this config type (its ``supports``
    still decides per (T, batch) whether the kernel applies)."""
    from ...models.convnet import ConvNetConfig
    from ...models.lstm import LSTMConfig

    if isinstance(cfg, LSTMConfig):
        from . import lstm as _lstm

        return _lstm
    if isinstance(cfg, ConvNetConfig):
        from . import convnet as _convnet

        return _convnet
    from . import stack as _stack

    return _stack
