from sparkts.plans.schema import forecast_schema, cv_schema, fitted_schema  # noqa: F401
