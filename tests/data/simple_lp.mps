* Tiny LP:  min -x1 - 2 x2
*           s.t. x1 + x2 <= 4, x1 <= 3, x1,x2 >= 0
* optimum: x = (0, 4), f = -8
NAME          SIMPLELP
ROWS
 N  COST
 L  LIM1
 L  LIM2
COLUMNS
    X1        COST      -1.0       LIM1      1.0
    X1        LIM2      1.0
    X2        COST      -2.0       LIM1      1.0
RHS
    RHS1      LIM1      4.0        LIM2      3.0
BOUNDS
ENDATA
