from .colormap import apply_float_colormap, print_color
