"""Drop-in ``StatsForecast`` facade over the Spark engine.

A reference user's code does ``StatsForecast(models, freq).forecast(df, h)``
with a pandas DataFrame and gets a pandas DataFrame back (reference
core.py:541-575 constructor; forecast core.py:882; the stateful
fit core.py:663 / predict core.py:766 pair stores fitted models on the
instance). This module gives that exact surface on Spark:

* pandas in → pandas out (converted through the active SparkSession;
  the conversion is the driver-side convenience path — for cluster-scale
  inputs pass a Spark DataFrame and get a Spark DataFrame back, zero
  collects);
* ``fit`` stores the distributed state TABLE on the instance (the
  Spark-native analogue of the reference's ``fitted_`` array) and
  ``predict(h)`` forwards from it — no re-fitting, matching the
  reference's scikit-learn-style contract;
* reference-only knobs that don't apply on a cluster (``n_jobs``,
  ``verbose``) are accepted and ignored, so constructor calls port
  unchanged.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from sparkts.engine import SparkForecast
from sparkts.kernels.base import Model


def _active_spark() -> SparkSession:
    spark = SparkSession.getActiveSession()
    if spark is None:
        from sparkts.session import get_spark

        spark = get_spark("sparkts-compat")
    return spark


class StatsForecast(SparkForecast):
    """Reference-signature facade (core.py:541): pandas or Spark frames in,
    same kind out; stateful ``fit``/``predict``; ``forecast`` stateless."""

    def __init__(
        self,
        models: Sequence[Model],
        freq: str | int,
        n_jobs: int = 1,
        fallback_model: Model | None = None,
        verbose: bool = False,
    ):
        super().__init__(models, freq, fallback_model=fallback_model)
        del n_jobs, verbose  # cluster engine: accepted for API parity
        #: the distributed (id, model, state) table after ``fit``
        self.fitted_states_: DataFrame | None = None

    # -- frame conversion ------------------------------------------------
    @staticmethod
    def _to_spark(df):
        if df is None or isinstance(df, DataFrame):
            return df, False
        if isinstance(df, pd.DataFrame):
            return _active_spark().createDataFrame(df), True
        if type(df).__module__.split(".")[0] == "polars":
            # the reference accepts polars frames everywhere
            # (core.py:28, _is_native core.py:1985-1989); no polars wheel
            # ships in this environment, so name the gap precisely
            raise TypeError(
                "polars DataFrames are not supported in this environment "
                "(no polars wheel available) — convert with .to_pandas() "
                "or pass a Spark DataFrame")
        raise TypeError(
            f"df must be a pandas or Spark DataFrame, got {type(df).__name__}")

    @staticmethod
    def _maybe_pandas(out: DataFrame, was_pandas: bool):
        return out.toPandas() if was_pandas else out

    # -- reference surface ----------------------------------------------
    def forecast(self, df=None, h=None, level=None, X_df=None, **kw):
        if df is None or h is None:
            raise ValueError("forecast needs df and h (reference core.py:882)")
        sdf, was_pd = self._to_spark(df)
        sx, _ = self._to_spark(X_df)
        out = super().forecast(sdf, h=h, level=level, X_df=sx, **kw)
        return self._maybe_pandas(out, was_pd)

    def fit(self, df=None, prediction_intervals=None, **kw):
        """Fit and STORE the state table; returns self for chaining
        (reference core.py:663). ``prediction_intervals`` mirrors the
        reference's kwarg: a ConformalIntervals config applied to every
        model that doesn't already carry one (reference
        _set_prediction_intervals)."""
        if df is None:
            raise ValueError("fit needs df")
        if prediction_intervals is not None:
            for m in self.models:
                if m.prediction_intervals is None:
                    m.prediction_intervals = prediction_intervals
        sdf, _ = self._to_spark(df)
        self._fit_was_pandas = isinstance(df, pd.DataFrame)
        self.fitted_states_ = super().fit(sdf, **kw)
        return self

    def predict(self, h=None, X_df=None, level=None, **kw):
        """Forecast from the stored state table (reference core.py:766:
        predict takes NO df — the fit is on the instance)."""
        if h is None:
            raise ValueError("predict needs h")
        if self.fitted_states_ is None:
            raise ValueError("call fit before predict (reference contract)")
        sx, _ = self._to_spark(X_df)
        out = super().predict(self.fitted_states_, h=h, level=level,
                              X_df=sx, **kw)
        return self._maybe_pandas(out, getattr(self, "_fit_was_pandas", False))

    def fit_predict(self, df=None, h=None, X_df=None, level=None, **kw):
        """fit + predict in one call (reference core.py:817)."""
        self.fit(df, **{k: v for k, v in kw.items()
                        if k in ("id_col", "time_col", "target_col")})
        return self.predict(h=h, X_df=X_df, level=level)

    def cross_validation(self, df=None, h=None, **kw):
        if df is None or h is None:
            raise ValueError("cross_validation needs df and h")
        sdf, was_pd = self._to_spark(df)
        out = super().cross_validation(sdf, h=h, **kw)
        return self._maybe_pandas(out, was_pd)

    def save(self, path=None):
        """Persist the fitted facade (reference core.py:1541 pickles the
        whole object): the distributed state table goes to
        ``<path>/states`` as parquet and the engine config (models, freq,
        fallback) to ``<path>/engine`` as a one-row pickled blob — no
        driver-side collect of the states, so this works at any scale."""
        import pickle

        if path is None:
            raise ValueError("save needs a path (no timestamped default: "
                             "deterministic pipelines name their artifacts)")
        if self.fitted_states_ is None:
            raise ValueError("call fit before save (reference contract)")
        self.fitted_states_.write.mode("overwrite").parquet(f"{path}/states")
        blob = pickle.dumps({
            "models": self.models,
            "freq": self.freq,
            "fallback_model": self.fallback_model,
            "fit_was_pandas": getattr(self, "_fit_was_pandas", False),
        })
        spark = _active_spark()
        spark.createDataFrame([(bytearray(blob),)],
                              "engine binary").coalesce(1).write.mode(
            "overwrite").parquet(f"{path}/engine")
        return path

    @staticmethod
    def load(path):
        """Restore a saved facade (reference core.py:1631): rebuilds the
        engine from the pickled config and re-attaches the state table
        lazily — predict works immediately, nothing is collected."""
        import pickle

        spark = _active_spark()
        blob = bytes(spark.read.parquet(f"{path}/engine").first()["engine"])
        cfg = pickle.loads(blob)
        sf = StatsForecast(cfg["models"], cfg["freq"],
                           fallback_model=cfg["fallback_model"])
        sf.fitted_states_ = spark.read.parquet(f"{path}/states")
        sf._fit_was_pandas = cfg["fit_was_pandas"]
        return sf

    def forecast_fitted_values(self, df=None, **kw):
        """In-sample predictions (reference core.py:1095 returns the values
        for the LAST forecast call; here stateless — pass the df)."""
        if df is None:
            raise ValueError("forecast_fitted_values needs df")
        sdf, was_pd = self._to_spark(df)
        out = super().fitted_values(sdf, **kw)
        return self._maybe_pandas(out, was_pd)

    def simulate(self, df=None, h=None, **kw):
        """Sample trajectories, pandas in → pandas out (reference
        core.py:1076 simulate signature; innovation distributions via
        ``error_dist``/``error_params``)."""
        if df is None or h is None:
            raise ValueError("simulate needs df and h")
        sdf, was_pd = self._to_spark(df)
        out = super().simulate(sdf, h=h, **kw)
        return self._maybe_pandas(out, was_pd)

    def cross_validation_fitted_values(self, df=None, h=None, **kw):
        """Train-window fitted values per cv window, pandas in → pandas
        out (reference core.py:1263)."""
        if df is None or h is None:
            raise ValueError("cross_validation_fitted_values needs df and h")
        sdf, was_pd = self._to_spark(df)
        out = super().cross_validation_fitted_values(sdf, h=h, **kw)
        return self._maybe_pandas(out, was_pd)
