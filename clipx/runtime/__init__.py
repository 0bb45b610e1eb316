from clipx.runtime.encoder import Encoder  # noqa: F401
