from .univariate import UnivariateForecaster, forecast_sales_and_profits  # noqa: F401
