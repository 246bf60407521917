from .iovar import save_var, load_var
