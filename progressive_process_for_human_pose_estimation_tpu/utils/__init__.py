from .precision import Policy, DEFAULT_POLICY, PARITY_POLICY  # noqa: F401
