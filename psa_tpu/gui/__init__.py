"""Interactive Tkinter GUI."""
