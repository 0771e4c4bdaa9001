from massivedatans_tpu.models.base import Problem  # noqa: F401
from massivedatans_tpu.models.gaussline import make_gaussline_problem  # noqa: F401
from massivedatans_tpu.models.analytic import make_analytic_gaussian_problem  # noqa: F401
