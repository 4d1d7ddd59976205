from .flagship import SDFGenerator, sgd_step  # noqa: F401
