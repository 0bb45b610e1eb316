from clipx.store.kv import Environment, open_env  # noqa: F401
