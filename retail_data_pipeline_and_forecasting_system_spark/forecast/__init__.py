from .univariate import UnivariateForecaster, forecast_sales_and_profits  # noqa: F401
from .mllib_model import fit_global_forecaster, forecast_next_days  # noqa: F401
