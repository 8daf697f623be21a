from sketchlib.ml.gaussiannb import GaussianNBModel, fit_gaussian_nb  # noqa: F401
