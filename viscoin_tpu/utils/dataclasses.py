"""IgnoreNone dataclass base (reference: viscoin/utils/dataclasses.py):
``None`` assignments fall through to the dataclass defaults, so optional CLI
flags can be passed directly into param dataclasses."""


class IgnoreNone:
    def __setattr__(self, name, value):
        if value is None:
            return
        super().__setattr__(name, value)
